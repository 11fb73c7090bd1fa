"""Shared loader for the repo's C++ libraries (native/*.so).

Both native components (the noise suppressor and the ingest copy library)
need the same bootstrap: find the shared object next to the sources, build
it on demand with make when only the sources are present (g++ is part of
the supported toolchain), and hand back a ctypes CDLL for the caller to
annotate. Centralized here so build/location fixes reach every binding.
"""

import ctypes
import os
import subprocess

NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native")


def build_and_load(so_name: str, source_name: str) -> ctypes.CDLL:
    """Load ``native/<so_name>``, building it first if only sources exist.

    Raises ImportError when the library cannot be produced — missing
    sources, missing ``make``, or a failing compiler — so callers can treat
    "no native library" as one condition and fall back uniformly.
    """
    lib_path = os.path.join(NATIVE_DIR, so_name)
    if not os.path.exists(lib_path):
        if not os.path.exists(os.path.join(NATIVE_DIR, source_name)):
            raise ImportError(
                f"Native library not found at {lib_path} and its sources "
                "are unavailable to build it.")
        try:
            subprocess.run(["make", "-C", NATIVE_DIR, so_name], check=True,
                           capture_output=True)
        except (subprocess.CalledProcessError, OSError) as e:
            detail = getattr(e, "stderr", b"") or b""
            raise ImportError(
                f"Building {so_name} failed (no working C++ toolchain?): "
                f"{e} {detail.decode(errors='replace')[-400:]}") from e
    return ctypes.CDLL(lib_path)
