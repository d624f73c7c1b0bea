"""Shared device-side span-encode driver + encode() phase timers.

Both speech encoders (LASER wav2vec2, SONAR w2v-BERT) embed overlap
windows of one waveform. ``SpanEncoderMixin.encode_spans`` holds the whole
device-assembly dataflow ONCE — wave bucketing + host-slicing fallback,
per-block quantize, materialized dequant, window chunking, the staged
index-upload thread, the fused-cache scatter, and the deferred pulls —
while the models supply only their shape policy via four small hooks:

    _span_plan(start, ln)     -> (bucket, (start, n_samples, out_len), truncated?)
    _span_buckets()           -> the bucket list (model units)
    _bucket_width(bucket)     -> window width in SAMPLES
    _rows_per_chunk(bucket)   -> batch rows for that bucket
    _span_forward(rows, scales, lengths, bucket) -> (rows, dim) embeddings

plus the ``_embed_dim`` and ``_trunc_unit`` properties (output width and
the truncation warning's bucket description).

Measured rationale for the dataflow (tools/profile_embed.py,
tools/ablate_assemble.py; 2026-08-17, v5e over the axon tunnel):
- concat overlap windows cover each sample ~13x and bucket padding adds
  ~2.4x, so host-side staging uploaded ~31x the raw audio bytes (243 MB
  for a 240 s file, 1.9 GB for 30 min) over a ~45 MB/s tunnel;
- the per-block dequant must be MATERIALIZED once per file
  (ops/assemble.get_dequant) — fused into the window gather it cost
  23.5 ms/chunk vs 0.8 ms split;
- int16 mode re-quantizes each window per-row on device so batches feed
  the SAME compiled forward programs as host staging (zero new encoder
  compiles); fp32 upload mode is bit-exact with host slicing
  (tests/test_encode_spans.py).
"""

import os
import time
from functools import partial as _partial

import jax
import jax.numpy as jnp
import numpy as np

from svecalign_tpu.utils.log_utils import logging

logger = logging.getLogger(__name__)

# opt-in phase timers for encode()/encode_spans (tools/profile_embed.py,
# SVECALIGN_EMBED_PROFILE): set via start_encode_profile() and the encode
# loops accumulate per-phase wall time. None (default) = zero-overhead off.
encode_profile = None


def start_encode_profile() -> dict:
    global encode_profile
    encode_profile = {
        "stage_wait_s": 0.0, "forward_dispatch_s": 0.0,
        "scatter_dispatch_s": 0.0, "pull_s": 0.0,
        "upload_bytes": 0, "chunks": 0, "rows": 0,
    }
    return encode_profile


@_partial(jax.jit, donate_argnums=(0,))
def _scatter_rows_fp16(dev: jax.Array, emb: jax.Array, idx: jax.Array) -> jax.Array:
    """Scatter a batch's embeddings into the fused-pipeline device buffer as
    fp16 (the .embed file dtype, so the cached rows and the file agree
    bit-for-bit). Out-of-range indices (batch padding) are dropped.

    ``dev`` is DONATED: the update happens in place instead of allocating a
    fresh (max_rows, dim) buffer per chunk — on the tunneled single-core
    host, every freed device buffer is client RPC work, and an hour-scale
    fused encode would otherwise churn hundreds of ~32 MB buffers."""
    return dev.at[idx].set(emb.astype(jnp.float16), mode="drop")


_PULL_ROWS = 2048  # 2048 x 1024 fp16 = 4 MB per pull — the measured D2H
# sweet spot: tools/ablate_stall.py found pull wall superlinear in size
# (64/32/8 MB = 3.78/0.85/0.25 s) and 4 MB chunks both faster in total and
# gentler on the post-pull host degradation than one big pull.


@_partial(jax.jit, static_argnames=("rows",))
def _slice_rows(dev: jax.Array, start, rows: int = _PULL_ROWS) -> jax.Array:
    return jax.lax.dynamic_slice(dev, (start, 0), (rows, dev.shape[1]))


def _pull_accumulated_rows(dev: jax.Array, n: int) -> np.ndarray:
    """Pull the first ``n`` rows of the (max_rows, dim) fp16 scatter
    accumulator in fixed 2048-row slices.

    Replaces the per-chunk deferred pulls (~34 ms tunnel overhead EACH —
    an hour-file has 100-400 chunks) with a handful of fixed-shape pulls:
    one dynamic_slice program total, ~4 MB per pull. Only valid when every
    span's row was scattered into ``dev`` (the fused keep_device path) and
    the caller wants fp16 — the accumulator rows ARE the fp16_pull values.
    """
    dim = dev.shape[1]
    out = np.empty((n, dim), np.float16)
    if dev.shape[0] <= _PULL_ROWS:
        out[:] = np.asarray(dev)[:n]
        return out
    for s in range(0, n, _PULL_ROWS):
        # clamp the window into the buffer; overlapping reads are fine
        start = min(s, dev.shape[0] - _PULL_ROWS)
        block = np.asarray(_slice_rows(dev, start))
        e = min(s + _PULL_ROWS, n)
        out[s:e] = block[s - start : s - start + (e - s)]
    return out


def _fused_chunk_enabled() -> bool:
    """One executable per chunk instead of three (OPT-IN:
    SVECALIGN_FUSED_CHUNK=1; default off).

    Measured on chip (tools/profile_embed.py --ab_fused_chunk, v5e
    2026-08-18) and left off for two reasons: (1) warm PARITY — 2.03 vs
    2.01 s per 240-s file, bit-identical rows — because the per-chunk
    wall is real device compute (~3,000x-RT forward at 62.8% MFU), not
    per-exec overhead; and (2) the fused program closes over the padded
    WAVE shape via the window gather, so its compile key is (wave bucket
    x span bucket x rows) — the whole encoder recompiles per wave-length
    bucket (~+190 s cold in the rehearsal) where the split path keys the
    expensive forward on (rows, bucket) alone. The materialized per-file
    dequant stays its own program either way (fusing THAT into the
    gather measured 23.5 ms/chunk vs 0.8 — module docstring)."""
    return os.environ.get("SVECALIGN_FUSED_CHUNK", "0") == "1"


@_partial(jax.jit, donate_argnums=(0,))
def _scatter_rows_fp16_idx4(dev, emb, idx4):
    """_scatter_rows_fp16 taking the staged (rows, 4) chunk index block —
    the target row ids ride the one staged upload (column 3) instead of a
    separate per-chunk device_put (which BLOCKS ~25 ms in the tunnel's
    post-D2H mode)."""
    return dev.at[idx4[:, 3]].set(emb.astype(jnp.float16), mode="drop")


@jax.jit
def _cast_fp16(emb: jax.Array) -> jax.Array:
    """fp32 -> fp16 on device, so the host pull moves half the bytes.

    The .embed file is fp16 by default, so the fp32 pull + host astype was
    2x wasted D2H traffic — and on the tunneled single-core host the
    post-pull CPU degradation is BYTES-proportional and outlives the pull
    by 15+ s (tools/ablate_stall.py, 2026-08-18: a 64 MB pull took 3.8 s
    and left host numpy 40-80x slow; 32 MB cut both roughly in half).
    XLA's convert and numpy's astype both round to nearest-even, so the
    written file is unchanged."""
    return emb.astype(jnp.float16)


class SpanEncoderMixin:
    """encode_spans() for models exposing the hook set described above."""

    def prewarm_span_programs(self, buckets=None) -> None:
        """Fire-and-forget: first-call the (bucket, rows) span forwards
        from daemon threads so the axon compile service overlaps the
        compiles (measured 1.4x on the 7-bucket LASER set: 121.8 s
        serial -> 86.8 s concurrent, tools/ablate_compile_parallel.py)
        while the caller's first file loads/encodes. The encode loop's
        own first call per bucket then waits on the in-flight compile
        instead of starting it serially. Zero batches are real forward
        executions (~15 ms device each) whose outputs are dropped.

        ``buckets``: the subset to prewarm, in priority order — the
        compile service partially serializes concurrent requests, so
        callers that know the corpus (seg_align/embed scans its concat
        files) pass the buckets it will actually hit, most-frequent
        first. The big win is what is NOT requested: SONAR's 3000/4500/
        6000-frame conformers belong to embed_align spans, never to
        overlap windows, and each is a full 24-layer compile stealing
        service time from the modal 700-frame program the first file
        blocks on. None = every _span_buckets() (round-4 behavior).
        Unknown buckets are ignored (the lazy compile path still covers
        a miss — prewarm is an optimization, never a gate).

        SVECALIGN_PREWARM_COMPILES=0 disables. Callers should skip tiny
        corpora (the embed stage gates on >= 4 files): the threads are
        daemonic, and an interpreter exiting mid-compile can log noisy
        RPC teardown errors."""
        if os.environ.get("SVECALIGN_PREWARM_COMPILES", "1") == "0":
            return
        import threading

        fp32 = self.upload_dtype == "fp32"

        def touch(bucket):
            try:
                rows = self._rows_per_chunk(bucket)
                width = self._bucket_width(bucket)
                wav = jnp.zeros(
                    (rows, width), jnp.float32 if fp32 else jnp.int16
                )
                scales = jnp.ones((rows,), jnp.float32)
                lengths = jnp.full((rows,), bucket, jnp.int32)
                np.asarray(self._span_forward(wav, scales, lengths, bucket))
            except Exception as e:  # pragma: no cover - diagnostics only
                logger.warning(f"prewarm bucket {bucket}: {e}")

        known = list(self._span_buckets())
        if buckets is None:
            todo = known
        else:
            todo = [b for b in buckets if b in known]
            logger.info(
                f"prewarm: {len(todo)}/{len(known)} buckets requested "
                f"(priority order {todo})"
            )
        for b in todo:
            threading.Thread(target=touch, args=(b,), daemon=True).start()

    def _get_fused_chunk(self, width: int, fp32: bool, bucket):
        """One jitted program per (width, fp32, bucket): window gather +
        span forward + fp16 scatter into the DONATED accumulator. None
        when the model can't inline its forward (mesh-sharded pjit path,
        or no _span_forward_pure hook)."""
        pure = getattr(self, "_span_forward_pure", lambda: None)()
        if pure is None:
            return None
        cache = self.__dict__.setdefault("_fused_chunk_jits", {})
        key = (width, fp32, bucket)
        fn = cache.get(key)
        if fn is None:
            from svecalign_tpu.ops import assemble

            def fused(params, dev, wave, idx4):
                rows_q, scales, lengths = assemble.assemble_pure(
                    wave, idx4[:, :3], width, fp32
                )
                emb = pure(params, rows_q, scales, lengths, bucket)
                return dev.at[idx4[:, 3]].set(
                    emb.astype(jnp.float16), mode="drop"
                )

            fn = cache[key] = jax.jit(fused, donate_argnums=(1,))
        return fn

    def encode_spans(
        self,
        waveform,
        spans,
        keep_device: bool = False,
        fp16_pull: bool = False,
    ):
        """Encode (start, end) sample spans of ONE waveform -> (N, dim).

        Equivalent to ``encode([waveform[s:e] for s, e in spans])`` with
        the waveform crossing the tunnel once and the overlap windows
        gathered into padded batches on device (module docstring has the
        measured rationale). fp32 upload mode is bit-exact with host
        slicing; int16 differs by ~one quantization step. Waveforms longer
        than the largest wave bucket fall back to host-sliced encode().

        ``fp16_pull``: cast each chunk's embeddings to fp16 ON DEVICE and
        return a float16 array — half the D2H bytes, same bits as the
        default fp16 .embed file (see ``_cast_fp16``).
        """
        from svecalign_tpu.ops import assemble

        waveform = np.asarray(waveform, dtype=np.float32)
        if waveform.ndim == 2:
            waveform = waveform[:, 0]
        # sorted() guards per-instance overrides: the bucket scan below
        # assumes ascending order (an unsorted list would silently pick an
        # oversized bucket or miss a fitting one)
        buckets_s = sorted(self.WAVE_BUCKETS_S or assemble.WAVE_BUCKETS_S)
        wave_len = next(
            (b * 16000 for b in buckets_s if len(waveform) <= b * 16000), None
        )
        if wave_len is None:
            logger.warning(
                f"encode_spans: waveform of {len(waveform) / 16000:.0f} s "
                f"exceeds the largest wave bucket ({buckets_s[-1]} s); "
                "falling back to host-sliced encode()"
            )
            return self.encode(
                [waveform[s:e] for s, e in spans],
                keep_device=keep_device,
                fp16_pull=fp16_pull,
            )

        fp32 = self.upload_dtype == "fp32"
        t0q = time.perf_counter()
        wave_host, block_scales = assemble.quantize_wave(waveform, wave_len, fp32)
        t0p = time.perf_counter()
        # materialized padded f32 dequant ONCE per file (assemble.get_dequant)
        slack = max(self._bucket_width(b) for b in self._span_buckets())
        wave_dev = assemble.get_dequant(wave_len, slack)(
            jnp.asarray(wave_host), jnp.asarray(block_scales)
        )
        if encode_profile is not None:
            encode_profile["wave_quant_s"] = t0p - t0q
            encode_profile["wave_put_s"] = time.perf_counter() - t0p

        out = np.zeros(
            (len(spans), self._embed_dim),
            dtype=np.float16 if fp16_pull else np.float32,
        )
        dev = None
        if keep_device:
            from svecalign_tpu.utils import embed_cache

            if len(spans) <= embed_cache.max_rows:
                dev = jnp.zeros(
                    (embed_cache.max_rows, self._embed_dim), jnp.float16
                )

        by_bucket: dict = {}
        n_truncated = 0
        for i, (s, e) in enumerate(spans):
            # clamp to the waveform like host slicing (waveform[s:e] is
            # short when e overruns the file; the forward's frame mask
            # must see the same length)
            ln = max(min(e, len(waveform)) - s, 0)
            bucket, idx_row, truncated = self._span_plan(s, ln)
            n_truncated += truncated
            by_bucket.setdefault(bucket, []).append((i, idx_row))
        if n_truncated:
            logger.warning(
                f"{n_truncated}/{len(spans)} spans exceed the largest "
                f"length bucket ({self._trunc_unit}) and are TRUNCATED "
                "to it — their embeddings cover only the prefix"
            )
        chunks = []
        for bucket, items in sorted(by_bucket.items()):
            rows = self._rows_per_chunk(bucket)
            for c0 in range(0, len(items), rows):
                chunks.append((rows, bucket, items[c0 : c0 + rows]))

        def stage(args):
            """device_put one chunk's (rows, 4) [start, n_samples, out_len,
            target_row] indices on a worker thread (puts block their caller
            in the tunnel's post-D2H mode; tiny as they are, ~25 ms each
            adds up). Column 3 feeds the fp16 scatter (int32.max = padding
            row, dropped); riding the same upload avoids a second blocking
            put per chunk."""
            rows, bucket, chunk = args
            idx = np.zeros((rows, 4), np.int32)
            idx[:, 3] = np.iinfo(np.int32).max
            for row, (i, idx_row) in enumerate(chunk):
                idx[row, :3] = idx_row
                idx[row, 3] = i
            return jnp.asarray(idx)

        prof = encode_profile
        t = time.perf_counter
        from concurrent.futures import ThreadPoolExecutor

        # the fused-chunk program needs the accumulator (it scatters into
        # it) and fp16 rows (the accumulator IS the output); otherwise the
        # chunk runs as separate assemble / forward / scatter programs
        fuse_chunks = dev is not None and fp16_pull and _fused_chunk_enabled()

        pending = []
        with ThreadPoolExecutor(1) as ex:
            fut = ex.submit(stage, chunks[0]) if chunks else None
            for ci, (rows, bucket, chunk) in enumerate(chunks):
                t0 = t()
                idx_dev = fut.result()
                if prof is not None:
                    prof["stage_wait_s"] += t() - t0
                    prof["upload_bytes"] += idx_dev.nbytes
                    prof["chunks"] += 1
                if ci + 1 < len(chunks):
                    fut = ex.submit(stage, chunks[ci + 1])
                t0 = t()
                width = self._bucket_width(bucket)
                fused = (
                    self._get_fused_chunk(width, fp32, bucket)
                    if fuse_chunks else None
                )
                if fused is not None:
                    dev = fused(self.params, dev, wave_dev, idx_dev)
                    if prof is not None:
                        prof["forward_dispatch_s"] += t() - t0
                    continue
                asm = assemble.get_assembler(wave_len + slack, width, fp32)
                rows_q, row_scales, lengths = asm(wave_dev, idx_dev)
                emb = self._span_forward(rows_q, row_scales, lengths, bucket)
                if fp16_pull:
                    emb = _cast_fp16(emb)
                if prof is not None:
                    prof["forward_dispatch_s"] += t() - t0
                if dev is not None:
                    t0 = t()
                    dev = _scatter_rows_fp16_idx4(dev, emb, idx_dev)
                    if prof is not None:
                        prof["scatter_dispatch_s"] += t() - t0
                pending.append((chunk, emb))

        t0 = t()
        if dev is not None and fp16_pull:
            del pending  # burst-free the chunk outputs (measured innocent)
            out = _pull_accumulated_rows(dev, len(spans))
        else:
            for chunk, emb in pending:
                emb = np.asarray(emb, dtype=out.dtype)
                for row, (i, _) in enumerate(chunk):
                    out[i] = emb[row]
        if prof is not None:
            prof["pull_s"] += t() - t0
            prof["rows"] += len(spans)
            prof["upload_bytes"] += wave_host.nbytes + block_scales.nbytes
        return (out, dev) if keep_device else out
