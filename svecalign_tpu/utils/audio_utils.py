"""Audio IO, fbank distance, and the Segment wrapper.

Audio decode/encode goes through the native C++ library in ``native/``
(libvorbis-backed ogg decode + wav read/write; the image has no libsndfile
or ffmpeg). Feature math (fbank) runs in XLA (:mod:`svecalign_tpu.ops.fbank`).

Mirrors the reference contract (svecalign/utils/audio_utils.py): 16 kHz
frames everywhere; ``find_untranslated_segs`` pairs each source segment with
the nearest target segment by midpoint and flags it identical when duration
difference and sliding-window fbank MSE are both below threshold.
"""

from pathlib import Path
from typing import List, Optional, Tuple, Union

import numpy as np

from svecalign_tpu.utils.log_utils import logging

logger = logging.getLogger(__name__)

SAMPLE_RATE = 16000


def load_waveform(
    path: Union[str, Path],
    start: int = 0,
    end: Optional[int] = None,
    sr: int = SAMPLE_RATE,
) -> np.ndarray:
    """Read (a slice of) an audio file as float32 mono-or-multi waveform.

    Supports .wav natively and .ogg via the native vorbis decoder.
    ``start``/``end`` are frame offsets, matching soundfile.read semantics
    in the reference (audio_utils.py:15-23).
    """
    from svecalign_tpu.utils import audio_io

    waveform, _sr = audio_io.read(str(path), start=start, stop=end)
    assert _sr == sr, f"Expected sample rate {sr} but got {_sr}"
    return waveform


def save_waveform(
    waveform: np.ndarray,
    target: Union[str, Path],
    sr: int = SAMPLE_RATE,
    overwrite_wav: bool = False,
) -> None:
    target = Path(target)
    if target.exists() and not overwrite_wav:
        return
    from svecalign_tpu.utils import audio_io

    audio_io.write(str(target), waveform, sr)


def binary_search(arr: np.ndarray, target: float) -> int:
    """Index of the element of sorted ``arr`` closest to ``target``.
    (reference audio_utils.py:97-112)."""
    _id = int(np.searchsorted(arr, target, sorter=None))
    if _id == 0:
        return _id
    if _id == len(arr):
        return _id - 1
    left = arr[_id - 1]
    right = arr[_id]
    if abs(target - left) > abs(target - right):
        return _id
    return _id - 1


def compute_fbank_dist(fbank1: np.ndarray, fbank2: np.ndarray) -> float:
    """Min MSE over all offsets of the shorter fbank inside the longer.
    (reference audio_utils.py:115-132). Vectorized: all windows at once.
    """
    if fbank1.shape[0] > fbank2.shape[0]:
        fbank1, fbank2 = fbank2, fbank1

    len1 = fbank1.shape[0]
    len2 = fbank2.shape[0]
    if len1 == 0:
        return float("inf")
    if len1 == len2:
        return float(np.mean(np.square(fbank1 - fbank2)))

    # sliding windows; note the reference iterates i in range(len2 - len1),
    # i.e. the final offset is excluded — preserved here.
    n_offsets = len2 - len1
    best = float("inf")
    for i in range(n_offsets):
        mse = float(np.mean(np.square(fbank1 - fbank2[i : i + len1])))
        best = min(best, mse)
    return best


class Segment:
    """A (start, end) frame span of an audio file.
    (reference audio_utils.py:154-203)."""

    def __init__(self, start: int, end: int, path: Union[str, Path]):
        assert end > start
        self._start = start
        self._end = end
        path = Path(path)
        assert path.exists()
        self._path = path

    @property
    def start(self) -> int:
        return self._start

    @property
    def end(self) -> int:
        return self._end

    @property
    def path(self) -> Path:
        return self._path

    @property
    def mid(self) -> float:
        return (self._start + self._end) / 2

    @property
    def duration(self) -> int:
        return self._end - self._start

    @property
    def waveform(self) -> np.ndarray:
        return load_waveform(self._path, start=self._start, end=self._end)

    def fbank(self, use_gpu: bool = False) -> np.ndarray:
        # use_gpu kept for call-compat; XLA picks the device
        from svecalign_tpu.ops.fbank import fbank as _fbank

        wav = self.waveform
        if wav.ndim == 2:  # (n, channels) -> first channel
            wav = wav[:, 0]
        return _fbank(wav, sample_rate=SAMPLE_RATE)

    def save(self, path: str) -> None:
        save_waveform(waveform=self.waveform, target=path)


def batch_segment_fbanks(segments: List["Segment"]) -> List[np.ndarray]:
    """Fbanks for many segments in ONE device program (ops/fbank.py
    fbank_batch), or the per-segment host-pinned loop — whichever fits the
    hardware. Measured crossover (tools/ablate_fbank.py, 2026-08-18, 400
    segs / 2198 s audio, tunneled v5e): device batch 11.7 s vs host loop
    0.9 s — the tunnel's ~45 MB/s collapsed transfer mode plus the
    bytes-proportional post-pull host stall eat the device win, so on the
    tunneled ``axon`` backend the host loop is 13x faster. On a
    locally-attached device the batched path is the right default.

    ``SVECALIGN_FBANK_BATCH``: ``0`` forces the host loop, ``1`` forces the
    device batch, unset/``auto`` picks by backend (host loop on axon)."""
    import os

    mode = os.environ.get("SVECALIGN_FBANK_BATCH", "auto")
    if mode == "auto":
        # Sniff a PINNED platform from config/env first: calling
        # jax.default_backend() under JAX_PLATFORMS=axon would initialize
        # the tunnel inside a host-pinned stage (+75 s measured on a busy
        # tunnel) for a stage that otherwise never touches the device.
        import jax

        cfg = (
            getattr(jax.config, "jax_platforms", None)
            or os.environ.get("JAX_PLATFORMS")
            or ""
        ).lower()
        if cfg:
            mode = "1" if "axon" not in cfg and "cpu" not in cfg else "0"
        else:
            # no platform pinned -> axon cannot be the default backend (it
            # only loads when JAX_PLATFORMS names it), so asking jax for
            # the real backend is safe: a locally-attached TPU/GPU inits in
            # well under a second, and that's exactly the machine where the
            # device batch wins (the +75 s init hazard is axon-only)
            mode = "1" if jax.default_backend() not in ("cpu",) else "0"
    if mode == "0":
        return [seg.fbank() for seg in segments]

    from svecalign_tpu.ops.fbank import fbank_batch

    waves = []
    for seg in segments:
        w = seg.waveform
        if w.ndim == 2:
            w = w[:, 0]
        waves.append(w)
    return fbank_batch(waves, sample_rate=SAMPLE_RATE)


def find_untranslated_segs(
    segments_1: List[Tuple[int, int]],
    segments_2: List[Tuple[int, int]],
    audio_1_path: Union[str, Path],
    audio_2_path: Union[str, Path],
    max_frame_diff: int,
    fbank_dist_thres: float,
) -> List[Tuple[int, int]]:
    """Find identical (untranslated) segments between the two sides.
    Returns (src_idx, tgt_idx) pairs. (reference audio_utils.py:38-94).

    Two phases: the cheap duration gate pairs each source segment with its
    midpoint-nearest target first; then the fbanks of every segment any
    surviving candidate touches are computed in one batched device call,
    and the sliding-MSE decisions run on host.
    """
    if len(segments_1) == 0 or len(segments_2) == 0:
        return []

    segs_1 = [Segment(s, e, audio_1_path) for s, e in segments_1]
    segs_2 = [Segment(s, e, audio_2_path) for s, e in segments_2]

    segs_2_mids = np.array([seg.mid for seg in segs_2], dtype=float)
    assert np.all(segs_2_mids[:-1] < segs_2_mids[1:]), segs_2_mids

    candidates = []
    for i, src_seg in enumerate(segs_1):
        closest_tgt_id = binary_search(segs_2_mids, src_seg.mid)
        if abs(src_seg.duration - segs_2[closest_tgt_id].duration) <= max_frame_diff:
            candidates.append((i, closest_tgt_id))
    if not candidates:
        return []

    # unique segments only: a popular target is decoded/featurized once
    need_1 = sorted({i for i, _ in candidates})
    need_2 = sorted({j for _, j in candidates})
    fbanks = batch_segment_fbanks(
        [segs_1[i] for i in need_1] + [segs_2[j] for j in need_2]
    )
    fb_1 = dict(zip(need_1, fbanks[: len(need_1)]))
    fb_2 = dict(zip(need_2, fbanks[len(need_1):]))

    return [
        (i, j)
        for i, j in candidates
        if compute_fbank_dist(fb_1[i], fb_2[j]) <= fbank_dist_thres
    ]
