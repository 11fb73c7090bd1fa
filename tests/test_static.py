"""Dependency-free static checks, mirroring the reference's lint gate
(reference pyproject.toml:16-22 runs flake8+mypy inside pytest). flake8/mypy
run in CI (.github/workflows/tests.yml); this AST-based subset keeps the gate
active in environments without them."""

import ast
import os
import pathlib

import pytest

PKG = pathlib.Path(__file__).resolve().parent.parent / "openwakeword_tpu"
SOURCES = sorted(str(p) for p in PKG.rglob("*.py"))
MAX_LINE = 120


@pytest.mark.parametrize("path", SOURCES, ids=lambda p: os.path.relpath(p, PKG))
def test_source_static(path):
    src = open(path).read()
    tree = ast.parse(src, filename=path)          # syntax gate

    # line-length gate (matches setup.cfg's flake8 max-line-length)
    long_lines = [i + 1 for i, line in enumerate(src.splitlines())
                  if len(line) > MAX_LINE]
    assert not long_lines, f"lines over {MAX_LINE} chars: {long_lines}"

    # unused-import gate (flake8 F401 subset; '# noqa' opts a line out)
    lines = src.splitlines()
    imported = {}     # alias -> lineno
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for a in node.names:
                imported[(a.asname or a.name).split(".")[0]] = node.lineno
        elif isinstance(node, ast.ImportFrom):
            for a in node.names:
                if a.name != "*":
                    imported[a.asname or a.name] = node.lineno
    used = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            used.add(node.id)
        elif isinstance(node, ast.Attribute):
            n = node
            while isinstance(n, ast.Attribute):
                n = n.value
            if isinstance(n, ast.Name):
                used.add(n.id)
    # names re-exported via __all__ or module docstring references count
    for node in ast.walk(tree):
        if isinstance(node, ast.Constant) and isinstance(node.value, str):
            used.update(node.value.split())
    unused = [(name, ln) for name, ln in imported.items()
              if name not in used and "noqa" not in lines[ln - 1]]
    assert not unused, f"unused imports: {unused}"
