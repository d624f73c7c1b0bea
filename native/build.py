"""Lazy builder for the native C++ runtime libraries.

Compiles ``native/*.cpp`` into shared objects on first use (the same
build-at-import convenience the reference gets from pyximport for its
Cython kernel, dp_utils.py:25) and caches them under ``native/build/``.
Rebuilds when the source is newer than the cached .so.
"""

import subprocess
from pathlib import Path

NATIVE_DIR = Path(__file__).resolve().parent
BUILD_DIR = NATIVE_DIR / "build"

_LINK_FLAGS = {
    "audio_io": [
        "-L/usr/lib/x86_64-linux-gnu",
        "-l:libvorbisfile.so.3",
        "-l:libvorbisenc.so.2",
        "-l:libvorbis.so.0",
        "-l:libogg.so.0",
    ],
    "dp_core": [],
}


def build_library(name: str) -> Path:
    """Compile native/<name>.cpp -> native/build/lib<name>.so (cached)."""
    src = NATIVE_DIR / f"{name}.cpp"
    out = BUILD_DIR / f"lib{name}.so"
    if out.exists() and out.stat().st_mtime >= src.stat().st_mtime:
        return out

    BUILD_DIR.mkdir(exist_ok=True)
    tmp = out.with_suffix(".so.tmp")
    cmd = [
        "g++",
        "-O3",
        "-march=native",
        "-shared",
        "-fPIC",
        "-std=c++17",
        str(src),
        "-o",
        str(tmp),
    ] + _LINK_FLAGS.get(name, [])
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    tmp.replace(out)
    return out
