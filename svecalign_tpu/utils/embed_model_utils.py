"""Embedding-model plumbing shared by the embed stages.

Mirrors the reference CLI contract (svecalign/utils/embed_model_utils.py:
16-56 ``add_embed_args``) with JAX backends. The reference slices every
segment to /tmp wav files and re-reads them (``save_segment_audio_and_tsv``,
:137-175); here segments are sliced in memory and fed straight to device
buffers (SURVEY.md section 3.2: the /tmp round trip is deleted by design).
"""

import argparse
from pathlib import Path
from typing import List, Tuple

import numpy as np

from svecalign_tpu.utils.audio_utils import SAMPLE_RATE, load_waveform
from svecalign_tpu.utils.embedding_utils import write_np_embeddings, write_stopes_embedding
from svecalign_tpu.utils.log_utils import logging

EMBED_MODEL_TYPES = ["speech_laser", "sonar"]

logger = logging.getLogger(__name__)


def add_embed_args(parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
    parser.add_argument("--embed_model_type", choices=EMBED_MODEL_TYPES,
                        default="speech_laser")
    parser.add_argument("--embed_fp32", action="store_true", default=False,
                        help="whether to save the embeddings in fp32. default is fp16.")
    # SpeechLASER setups
    parser.add_argument("--sl_ckpt_dir", type=str, default=None,
                        help="the dir to all speech laser models (.npz converted weights).")
    parser.add_argument("--sl_ckpt_name", type=str, default=None,
                        help="which SpeechLASER weights to use, e.g. `english.npz`.")
    parser.add_argument("--max_tokens", type=int, default=150 * SAMPLE_RATE,
                        help="in number of SAMPLES")
    # SONAR setups
    parser.add_argument("--sonar_name", type=str, default=None,
                        help="path to SONAR-style .npz weights (or a name tag).")
    parser.add_argument("--batch_size", type=int, default=16,
                        help="number of audios per batch.")
    parser.add_argument("--n_proc", type=int, default=1)
    parser.add_argument("--compile_sonar", action="store_true", default=False,
                        help="accepted for CLI parity; JAX always jit-compiles.")
    parser.add_argument("--upload_precision", type=str, default="int16",
                        choices=["int16", "fp32"],
                        help="waveform/feature host->device upload precision: "
                             "int16 halves bytes over the tunnel (~3e-5 input "
                             "noise); fp32 is the exact path for parity runs.")
    parser.add_argument("--window_assembly", type=str, default="device",
                        choices=["device", "host"],
                        help="how overlap-window batches are built: 'device' "
                             "uploads each waveform once and gathers the "
                             "(heavily overlapping) windows on device — "
                             "~31x fewer upload bytes, measured "
                             "(tools/profile_embed.py); 'host' slices and "
                             "stages every padded window batch host-side "
                             "(the round-2 path). With --upload_precision "
                             "fp32 both modes are bit-identical; with int16 "
                             "they differ by ~one quantization step.")
    return parser


# In-process pipeline runs call load_embed_model once per language per
# embedding stage (4x for the toy graph); every fresh model instance means
# fresh jit closures, and axon recompiles cost 20-300 s per bucket program.
# Memoize on the full argument tuple: stage timings on the toy e2e run were
# embed 197 s + embed_align 121 s, almost all of it repeated init+compile.
_model_memo = {}


def load_embed_model(
    embed_model_type: str,
    sl_ckpt_dir=None,
    sl_ckpt_name=None,
    max_tokens=None,
    sonar_name=None,
    sonar_fp16: bool = False,
    compile_sonar: bool = False,
    batch_size: int = 16,
    upload_precision: str = "int16",
):
    key = (embed_model_type, sl_ckpt_dir, sl_ckpt_name, max_tokens,
           sonar_name, sonar_fp16, compile_sonar, batch_size,
           upload_precision)
    if key in _model_memo:
        logger.info(f"Reusing the loaded {embed_model_type} model")
        return _model_memo[key]
    model = _build_embed_model(
        embed_model_type, sl_ckpt_dir, sl_ckpt_name, max_tokens, sonar_name,
        sonar_fp16, compile_sonar, batch_size, upload_precision,
    )
    _model_memo[key] = model
    return model


def _build_embed_model(
    embed_model_type: str,
    sl_ckpt_dir=None,
    sl_ckpt_name=None,
    max_tokens=None,
    sonar_name=None,
    sonar_fp16: bool = False,
    compile_sonar: bool = False,
    batch_size: int = 16,
    upload_precision: str = "int16",
):
    if embed_model_type == "speech_laser":
        from svecalign_tpu.models.laser_encoder import SpeechLaserModel

        ckpt = None
        if sl_ckpt_dir and sl_ckpt_name:
            candidate = Path(sl_ckpt_dir) / sl_ckpt_name
            if candidate.exists():
                ckpt = str(candidate)
            else:
                logger.warning(f"{candidate} not found; using random weights.")
        return SpeechLaserModel(
            ckpt_path=ckpt, max_tokens=max_tokens or 150 * SAMPLE_RATE,
            upload_dtype=upload_precision,
        )
    if embed_model_type == "sonar":
        from svecalign_tpu.models.sonar_encoder import SonarSpeechModel

        ckpt = sonar_name if sonar_name and Path(sonar_name).exists() else None
        return SonarSpeechModel(
            ckpt_path=ckpt, batch_size=batch_size,
            upload_dtype=upload_precision,
        )
    raise NotImplementedError(f"Unsupported model {embed_model_type}")


def slice_segments(
    wave_path: str, segments: List[Tuple[int, int]]
) -> List[np.ndarray]:
    """Read each (start, end) frame span of the audio into memory.

    Reads the full file once and slices (the file is read at most once per
    stage invocation; segments heavily overlap in the concat stage).
    """
    waveform = load_waveform(wave_path, sr=SAMPLE_RATE)
    if waveform.ndim == 2:
        waveform = waveform[:, 0]
    return [waveform[s:e] for s, e in segments]


def embed_segments_to_file(
    embed_model,
    embed_model_type: str,
    wave_path: str,
    segments: List[Tuple[int, int]],
    out_path: str,
    fp16: bool = True,
    cache_key: str = None,
    window_assembly: str = "device",
    waveform: np.ndarray = None,
) -> np.ndarray:
    """Embed all segments of one audio and write the .embed file.

    SpeechLASER flavor -> fp16/fp32 .npy (stopes format); SONAR flavor ->
    headerless raw binary (reference embed_model_utils.py:102-134).

    ``cache_key``: when the fused pipeline handoff is enabled
    (utils/embed_cache.py), also keep the rows on device under this key —
    normally the FINAL .embed path (``out_path`` is the tmp file) — so the
    align stage skips the read+re-upload.

    ``window_assembly="device"``: upload the waveform once and gather the
    overlap windows on device via ``encode_spans`` (see --window_assembly
    help); "host" keeps the round-2 slice-and-stage path.

    ``waveform``: optionally the already-loaded audio (the embed stage
    prefetches the next file's decode on a worker thread while the
    current file encodes — the single-core host otherwise serializes
    ~0.5-3 s of wav decode per file against idle device time).
    """
    from svecalign_tpu.utils import embed_cache

    fused = (
        embed_cache.enabled
        and cache_key is not None
        and fp16  # the cached device rows are fp16: they must equal the file
        and getattr(embed_model, "supports_keep_device", False)
    )
    if window_assembly == "device" and getattr(
        embed_model, "supports_spans", False
    ):
        if waveform is None:
            waveform = load_waveform(wave_path, sr=SAMPLE_RATE)
        if fused:
            emb, dev = embed_model.encode_spans(
                waveform, segments, keep_device=True, fp16_pull=fp16
            )
            embed_cache.put(cache_key, emb.shape[0], dev)
        else:
            emb = embed_model.encode_spans(waveform, segments, fp16_pull=fp16)
    elif fused:
        emb, dev = embed_model.encode(
            slice_segments(wave_path, segments), keep_device=True,
            fp16_pull=fp16,
        )
        embed_cache.put(cache_key, emb.shape[0], dev)
    else:
        emb = embed_model.encode(
            slice_segments(wave_path, segments), fp16_pull=fp16
        )
    if embed_model_type == "speech_laser":
        write_stopes_embedding(emb, out_path, fp16=fp16)
    else:
        write_np_embeddings(emb, out_path, fp16=fp16)
    return emb
