"""Asset downloader + converter.

Downloads the reference's released model artifacts from GitHub (reference
utils.py:604-673 contract) and converts each .onnx/.tflite into the native
.npz checkpoint format next to it, so the registry paths resolve. In
zero-egress environments ``convert_local_models`` imports artifacts already
on disk.
"""

import logging
import os
import pathlib
from typing import List

from openwakeword_tpu import registry

_DEFAULT_TARGET = os.path.join(pathlib.Path(__file__).parent.parent.resolve(),
                               "resources", "models")


def download_file(url: str, target_directory: str, file_size=None):
    """Stream one file from a URL (requests, with tqdm when available).

    Streams to a ``.part`` name and renames on success, so an interrupted
    download never leaves a truncated file that later runs mistake for a
    complete artifact."""
    import requests
    local_filename = url.split("/")[-1]
    os.makedirs(target_directory, exist_ok=True)
    final_path = os.path.join(target_directory, local_filename)
    part_path = final_path + ".part"
    with requests.get(url, stream=True, timeout=60) as r:
        r.raise_for_status()
        try:
            from tqdm import tqdm
            total = file_size or int(r.headers.get("content-length", 0))
            bar = tqdm(total=total, unit="iB", unit_scale=True, desc=local_filename)
        except ImportError:
            bar = None
        try:
            with open(part_path, "wb") as f:
                for chunk in r.iter_content(chunk_size=8192):
                    f.write(chunk)
                    if bar:
                        bar.update(len(chunk))
        except BaseException:
            if os.path.exists(part_path):
                os.remove(part_path)
            raise
        if bar:
            bar.close()
    os.replace(part_path, final_path)
    return final_path


def convert_to_native(artifact_path: str, output_path: str = "") -> str:
    """Convert an .onnx/.tflite artifact to a native .npz checkpoint."""
    from openwakeword_tpu.io.loaders import load_model_file
    from openwakeword_tpu.io.checkpoints import save_checkpoint
    kind, params, meta = load_model_file(artifact_path)
    if not output_path:
        output_path = os.path.splitext(artifact_path)[0] + ".npz"
    extra = {k: v for k, v in meta.items() if k != "kind"}
    save_checkpoint(output_path, kind, params, extra)
    return output_path


def convert_local_models(source_directory: str,
                         target_directory: str = _DEFAULT_TARGET) -> List[str]:
    """Convert every .onnx/.tflite artifact in a directory into native
    checkpoints under the registry's resources/models path. ONNX is preferred
    when both variants exist (raw BatchNorm params preserved)."""
    os.makedirs(target_directory, exist_ok=True)
    converted = []
    names = sorted(os.listdir(source_directory))
    stems_with_onnx = {os.path.splitext(n)[0] for n in names if n.endswith(".onnx")}
    for name in names:
        stem, ext = os.path.splitext(name)
        if ext not in (".onnx", ".tflite"):
            continue
        if ext == ".tflite" and stem in stems_with_onnx:
            continue
        src = os.path.join(source_directory, name)
        dst = os.path.join(target_directory, stem + ".npz")
        try:
            converted.append(convert_to_native(src, dst))
        except (ValueError, NotImplementedError) as e:
            logging.warning("Skipping %s: %s", name, e)
    return converted


def download_models(model_names: List[str] = [],
                    target_directory: str = _DEFAULT_TARGET):
    """Download feature/VAD models plus the requested (default: all)
    pretrained wakeword artifacts and convert them to native checkpoints
    (reference utils.py:625-673 contract)."""
    if not isinstance(model_names, list):
        raise ValueError("The model_names argument must be a list of strings")
    os.makedirs(target_directory, exist_ok=True)

    urls = [registry.FEATURE_MODELS["embedding"]["download_url"]]
    urls += [v["download_url"] for v in registry.VAD_MODELS.values()]
    wanted = registry.MODELS
    if model_names:
        wanted = {k: v for k, v in registry.MODELS.items()
                  if any(m in v["download_url"].split("/")[-1] or m == k for m in model_names)}
        unmatched = [m for m in model_names
                     if not any(m in v["download_url"].split("/")[-1] or m == k
                                for k, v in registry.MODELS.items())]
        if unmatched:
            raise ValueError(
                f"Unknown model name(s) {unmatched}; known models: "
                f"{sorted(registry.MODELS.keys())}")
    urls += [v["download_url"] for v in wanted.values()]

    for url in urls:
        fname = url.split("/")[-1]
        stem = os.path.splitext(fname)[0]
        native = os.path.join(target_directory, stem + ".npz")
        if os.path.exists(native):
            continue
        artifact = os.path.join(target_directory, fname)
        if not os.path.exists(artifact):
            try:
                artifact = download_file(url, target_directory)
            except Exception as e:
                logging.warning("Could not download %s (%s); skipping.", url, e)
                continue
        try:
            convert_to_native(artifact, native)
        except (ValueError, NotImplementedError) as e:
            logging.warning("Downloaded %s but could not convert: %s", fname, e)
