"""ctypes binding to the native audio IO library (native/audio_io.cpp).

Read returns float32 arrays shaped like soundfile.read: (n,) for mono,
(n, channels) otherwise — the reference's loaders rely on that shape
contract (svecalign/utils/audio_utils.py:15-23).
"""

import ctypes
from functools import lru_cache
from pathlib import Path
from typing import Optional, Tuple

import numpy as np


@lru_cache(maxsize=1)
def _lib() -> ctypes.CDLL:
    import sys

    repo_root = Path(__file__).resolve().parents[2]
    sys.path.insert(0, str(repo_root))
    try:
        from native.build import build_library
    finally:
        sys.path.pop(0)

    lib = ctypes.CDLL(str(build_library("audio_io")))
    lib.sva_audio_info.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.sva_audio_info.restype = ctypes.c_int
    lib.sva_audio_read.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.sva_audio_read.restype = ctypes.c_int64
    lib.sva_wav_write.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.c_int,
        ctypes.c_int,
    ]
    lib.sva_wav_write.restype = ctypes.c_int
    lib.sva_ogg_write.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_float,
    ]
    lib.sva_ogg_write.restype = ctypes.c_int
    return lib


def info(path: str) -> Tuple[int, int, int]:
    """Return (sample_rate, frames, channels)."""
    sr = ctypes.c_int()
    frames = ctypes.c_int64()
    ch = ctypes.c_int()
    ret = _lib().sva_audio_info(path.encode(), ctypes.byref(sr), ctypes.byref(frames), ctypes.byref(ch))
    if ret != 0:
        raise IOError(f"cannot read audio info from {path} (code {ret})")
    return sr.value, frames.value, ch.value


def read(
    path: str, start: int = 0, stop: Optional[int] = None
) -> Tuple[np.ndarray, int]:
    """Read frames [start, stop) as float32. Returns (waveform, sample_rate)."""
    sr, total, ch = info(path)
    if stop is None or stop > total:
        stop = total
    count = max(stop - start, 0)
    out = np.empty(count * ch, dtype=np.float32)
    if count:
        got = _lib().sva_audio_read(
            path.encode(), start, count, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        )
        if got < 0:
            raise IOError(f"failed to read {path} (code {got})")
        if got < count:
            out = out[: got * ch]
            count = got
    wav = out.reshape(count, ch)
    if ch == 1:
        wav = wav[:, 0]
    return wav, sr


def write(path: str, waveform: np.ndarray, sample_rate: int, quality: float = 0.4) -> None:
    """Write float32 waveform ((n,) or (n, ch)) as .wav (PCM16) or .ogg (vorbis)."""
    waveform = np.ascontiguousarray(waveform, dtype=np.float32)
    if waveform.ndim == 1:
        waveform = waveform[:, None]
    frames, ch = waveform.shape
    ptr = waveform.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    if path.endswith(".ogg"):
        ret = _lib().sva_ogg_write(path.encode(), ptr, frames, ch, sample_rate, quality)
    else:
        ret = _lib().sva_wav_write(path.encode(), ptr, frames, ch, sample_rate)
    if ret != 0:
        raise IOError(f"failed to write {path} (code {ret})")
