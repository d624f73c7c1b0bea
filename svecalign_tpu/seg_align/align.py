"""Stage 5.4 — per-pair alignment driver CLI.

Validates that segments / concats / embeds (and optional ignore indices)
exist for every pair, then aligns each pair with the coarse-to-fine DP
aligner, writing ``[x]:[y]:cost`` lines to ``OUT/{src}-{tgt}/
{srcstem}-{tgtstem}.txt``. (Reference svecalign/seg_align/align.py.)

CLI: ``python -m svecalign_tpu.seg_align.align METADATA OUT_DIR --src_lang S
--tgt_lang T --seg_dir D --concat_dir C --embed_dir E [--is_stopes_embed]
[--fp16_embed] [-a 6] [...] [--ign_indices_dir I]``
"""

import argparse
import os
import time
from pathlib import Path
from typing import Dict, List, NamedTuple, Optional, Sequence, Tuple

from svecalign_tpu.utils.file_utils import check_exist, read_metadata
from svecalign_tpu.utils.log_utils import logging, my_tqdm
from svecalign_tpu.vecalign.vecalign import align as vecalign_func

logger = logging.getLogger(__name__)


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("metadata", type=str,
                        help="the meta file that each line contains paired audio paths")
    parser.add_argument("out_dir", type=str, help="dir to save alignments.")
    parser.add_argument("--src_lang", type=str, required=True)
    parser.add_argument("--tgt_lang", type=str, required=True)
    parser.add_argument("--seg_dir", type=str, required=True,
                        help="the dir for raw segments.")
    parser.add_argument("--concat_dir", type=str, required=True,
                        help="the dir for concatenated segments.")
    parser.add_argument("--embed_dir", type=str, required=True,
                        help="Dir to embedding files.")
    parser.add_argument("--is_stopes_embed", action="store_true", default=False,
                        help="whether the embeddings are .npy (stopes/SpeechLASER flavor).")
    parser.add_argument("--fp16_embed", action="store_true", default=False,
                        help="whether raw embeddings are fp16 (SONAR flavor).")
    parser.add_argument("-a", "--alignment_max_size", dest="alignment_max_size",
                        type=int, default=6,
                        help="Searches for alignments up to size N-M, where N+M <= this value.")
    parser.add_argument("--search_buffer_size", type=int, default=5,
                        help="Width (one side) of search buffer.")
    parser.add_argument("-d", "--del_percentile_frac", dest="del_percentile_frac",
                        type=float, default=0.2,
                        help="Deletion penalty percentile (as a fraction).")
    parser.add_argument("--max_size_full_dp", type=int, default=300,
                        help="Maximum size N for full N^2 DP.")
    parser.add_argument("--costs_sample_size", type=int, default=20000,
                        help="Sample size for the deletion-penalty cost distribution.")
    parser.add_argument("--num_samps_for_norm", type=int, default=100,
                        help="Number of samples used for normalizing embeddings.")
    parser.add_argument("--ign_indices_dir", type=str, default=None,
                        help="if provided, some segments will be ignored when loading embeddings.")
    parser.add_argument("--seed", type=int, default=42,
                        help="RNG seed (new; the reference is unseeded).")
    parser.add_argument("--profile_dir", type=str, default=None,
                        help="if set, write a JAX profiler trace of the alignment loop "
                             "here (view with tensorboard / xprof).")
    parser.add_argument("--pair_batch", type=int, default=1,
                        help="align this many document pairs per device program "
                             "(batched pyramid; amortizes host<->device latency).")
    parser.add_argument("--data_parallel", type=int, default=1,
                        help="shard each bucket's pair axis over this many local "
                             "devices (jax.sharding mesh; the DP is per-pair, so "
                             "the program has zero collectives). 0 = all local "
                             "devices. Implies the batched driver; pair_batch is "
                             "rounded up to a multiple of the device count.")
    parser.add_argument("--upload_quant", type=str, default="fp16",
                        choices=["fp16", "int8", "int4"],
                        help="embedding upload precision for the batched path: "
                             "int8 halves host->device bytes (per-row scales; "
                             "~0.3%% cosine noise), int4 packs two codes per "
                             "byte (quarter of fp16; ~2%% cosine noise, "
                             "committed-example quality gate in tests).")
    parser.add_argument("--dp_backend", type=str, default="auto",
                        choices=["auto", "pallas", "xla", "native"],
                        help="banded-DP kernel: Pallas VMEM wavefront (TPU), XLA "
                             "scan, or the C++ float64 host kernel (native only "
                             "applies to --pair_batch 1; the batched path picks "
                             "the in-kernel pair-batched Pallas on TPU).")
    return parser.parse_args()


class PairTask(NamedTuple):
    """Resolved per-document-pair file paths, index 0 = src / 1 = tgt.

    Each input field holds one path per side; ``ignores`` entries are
    ``None`` when no untranslated-concat id file exists for that side.
    """

    segs: Tuple[str, str]
    concats: Tuple[str, str]
    embeds: Tuple[str, str]
    ignores: Tuple[Optional[str], Optional[str]]
    out_path: str


# input kinds a pair needs before it can be aligned: field name -> suffix
_PAIR_INPUTS = (("segs", ".txt"), ("concats", ".txt"), ("embeds", ".embed"))


def collect_pair_tasks(
    audio_pairs: Sequence[Tuple[str, str]],
    dirs: Dict[str, Tuple[Path, Path]],
    out_dir: Path,
    ign_indices_dir: Optional[Path] = None,
) -> List[PairTask]:
    """Resolve each metadata pair's stage inputs into a :class:`PairTask`.

    ``dirs`` maps each input kind of ``_PAIR_INPUTS`` to its (src, tgt)
    directory pair. Pairs missing any required file are dropped (with a
    warning via ``check_exist``); ignore-index files are optional.
    """
    tasks = []
    for audio in audio_pairs:
        names = tuple(Path(a).name for a in audio)
        stems = tuple(Path(a).stem for a in audio)
        found = {
            kind: tuple(
                (d / n).with_suffix(suffix)
                for d, n in zip(dirs[kind], names)
            )
            for kind, suffix in _PAIR_INPUTS
        }
        if not all(check_exist(p) for kind, _ in _PAIR_INPUTS for p in found[kind]):
            continue

        ignores: Tuple[Optional[str], Optional[str]] = (None, None)
        if ign_indices_dir is not None:
            cand = [
                ign_indices_dir / f"{stems[0]}-{stems[1]}.{side}.txt"
                for side in ("src", "tgt")
            ]
            ignores = tuple(
                p.as_posix() if check_exist(p) else None for p in cand
            )

        tasks.append(
            PairTask(
                segs=tuple(p.as_posix() for p in found["segs"]),
                concats=tuple(p.as_posix() for p in found["concats"]),
                embeds=tuple(p.as_posix() for p in found["embeds"]),
                ignores=ignores,
                out_path=(out_dir / f"{stems[0]}-{stems[1]}.txt").as_posix(),
            )
        )
    return tasks


def main():
    args = parse_args()
    logger.info(args)

    src_lang, tgt_lang = args.src_lang, args.tgt_lang
    out_dir = Path(args.out_dir) / f"{src_lang}-{tgt_lang}"
    out_dir.mkdir(parents=True, exist_ok=True)

    if args.ign_indices_dir is None:
        ign_indices_dir = None
    else:
        ign_indices_dir = Path(args.ign_indices_dir) / f"{src_lang}-{tgt_lang}"
        logger.info(f"Will ignore segments indicated by {ign_indices_dir}")

    all_pairs = read_metadata(args.metadata)
    valid_pairs = collect_pair_tasks(
        all_pairs,
        {
            "segs": (Path(args.seg_dir) / src_lang, Path(args.seg_dir) / tgt_lang),
            "concats": (Path(args.concat_dir) / src_lang, Path(args.concat_dir) / tgt_lang),
            "embeds": (Path(args.embed_dir) / src_lang, Path(args.embed_dir) / tgt_lang),
        },
        out_dir,
        ign_indices_dir,
    )

    import contextlib

    profile_ctx = contextlib.nullcontext()
    if args.profile_dir:
        import jax

        profile_ctx = jax.profiler.trace(args.profile_dir)

    from svecalign_tpu.utils import embed_cache

    with profile_ctx:
        # the fused pipeline handoff lives in the batched driver, so use it
        # (even at batch 1) whenever the embed stage left rows on device
        if args.pair_batch > 1 or embed_cache.enabled or args.data_parallel != 1:
            if args.pair_batch <= 1 and embed_cache.enabled:
                logger.info(
                    "fused handoff: using the batched aligner driver even at "
                    "pair_batch 1 (its seeded sampling differs slightly from "
                    "the per-pair path; gold-quality gated in tests)"
                )
            if args.dp_backend == "native":
                logger.warning(
                    "--dp_backend native is ignored with --pair_batch > 1: "
                    "the batched pyramid runs on device (pallas/xla)."
                )
            _run_pairs_batched(args, valid_pairs)
        else:
            _run_pairs(args, valid_pairs)


def _run_pairs_batched(args, valid_pairs):
    """Batched path: bucket pairs by size and run the batched pyramid."""
    import math

    import numpy as np

    from svecalign_tpu.utils import embed_cache
    from svecalign_tpu.utils.embedding_utils import (
        make_doc_ids,
        read_in_embeddings,
        read_sent2id,
    )
    from svecalign_tpu.vecalign.batch import (
        run_staged,
        stage_rows_device,
        stage_rows_upload,
    )
    from svecalign_tpu.vecalign.vecalign import (
        load_ignore_index_file,
        make_alignment_types,
        print_alignments,
    )

    types = make_alignment_types(args.alignment_max_size)
    width_over2 = math.ceil((args.alignment_max_size - 1) / 2.0) + args.search_buffer_size

    # SVECALIGN_ALIGN_PROFILE=1: wall-clock the driver's phases (pair
    # loading, per-bucket staging/pyramid/write). The rehearsal showed the
    # align stage costing ~4x its standalone wall when it runs right after
    # the embed stage — the profile attributes that gap in-context.
    profile = os.environ.get("SVECALIGN_ALIGN_PROFILE") == "1"
    prof = {"load": 0.0, "stage": 0.0, "pyramid": 0.0, "write": 0.0}
    t_phase = time.perf_counter()

    loaded = []        # file-backed pairs: fp16 rows re-uploaded per bucket
    fused_loaded = []  # fused-pipeline pairs: rows already on device
    for pair in valid_pairs:
        seg_lines = [open(p, encoding="utf-8").readlines() for p in pair.segs]

        cached = [embed_cache.get(p) for p in pair.embeds]
        if all(c is not None for c in cached):
            # fused pipeline (utils/embed_cache.py): the embed stage left
            # the rows on device — no file read, no re-upload
            sent2id = [read_sent2id(p) for p in pair.concats]
            n_rows = [c[0] for c in cached]
            embs = [c[1] for c in cached]
        else:
            cached = None
            sent2id, embs = [], []
            for concat_p, embed_p in zip(pair.concats, pair.embeds):
                s2i, emb = read_in_embeddings(
                    concat_p, embed_p, args.is_stopes_embed, args.fp16_embed,
                )
                sent2id.append(s2i)
                embs.append(emb.astype(np.float16))
            n_rows = [e.shape[0] for e in embs]
        # raw fp16 rows + index maps: the overlap tensor is gathered on
        # device (uploading it materialized repeats every row ~n_overlaps x)
        ids = [
            make_doc_ids(
                sent2id[side], n_rows[side], seg_lines[side],
                args.alignment_max_size - 1,
                ignore_indices=load_ignore_index_file(pair.ignores[side])
                if pair.ignores[side] else None,
                overlap_segments=True,
            )
            for side in (0, 1)
        ]
        item = (pair, embs[0], ids[0], embs[1], ids[1])
        (fused_loaded if cached is not None else loaded).append(item)
    prof["load"] = time.perf_counter() - t_phase

    kwargs = dict(
        final_alignment_types=types,
        del_percentile_frac=args.del_percentile_frac,
        width_over2=width_over2,
        max_size_full_dp=args.max_size_full_dp,
        costs_sample_size=args.costs_sample_size,
        num_samps_for_norm=args.num_samps_for_norm,
        seed=args.seed,
        dp_backend=args.dp_backend if args.dp_backend != "native" else "auto",
    )

    if fused_loaded:
        logger.info(
            f"fused pipeline: {len(fused_loaded)}/{len(fused_loaded) + len(loaded)} "
            "pairs use device-resident embeddings (no re-upload)"
        )
    if embed_cache.enabled and loaded:
        # surface the silent 15-45x slowdown: in a fused run every pair
        # SHOULD be cache-resident — a fallback means the document exceeded
        # the cache cap, the HBM byte cap rejected it, or a resume run
        # skipped the embed stage (cache never filled)
        names = ", ".join(Path(p.embeds[0]).stem for p, *_ in loaded[:5])
        logger.warning(
            f"fused handoff MISSED {len(loaded)} pair(s) — falling back to "
            f"the file+upload path for: {names}"
            + (" ..." if len(loaded) > 5 else "")
            + f" (cache stats: {embed_cache.stats})"
        )

    # multi-chip: shard each bucket's pair axis over a local device mesh —
    # every device stage partitions trivially (no cross-pair dependence),
    # the Pallas DP runs per-shard inside a shard_map (vecalign/batch.py)
    sharding = None
    pair_batch = args.pair_batch
    if args.data_parallel != 1:
        import jax

        from svecalign_tpu.parallel.mesh import batch_sharding, make_mesh

        n_dev = args.data_parallel if args.data_parallel > 0 else len(jax.devices())
        mesh = make_mesh(n_devices=n_dev, model_parallel=1)
        sharding = batch_sharding(mesh)
        pair_batch = -(-max(pair_batch, 1) // n_dev) * n_dev
        logger.info(f"data-parallel aligner: {n_dev} devices, pair_batch {pair_batch}")

    # bucket by size so padding stays modest; double-buffer: bucket i+1's
    # upload is dispatched (async) before bucket i's compute is consumed.
    # Fused pairs form their own buckets with the device staging path.
    quant = args.upload_quant

    # a short tail bucket would compile its own (P, ...) program family —
    # round it up to the full pair_batch (duplicated pairs' outputs are
    # dropped by the result zip) whenever other buckets exist to share
    # programs with; a run that fits in one bucket keeps its exact P.
    # DEVICE-staged buckets only: stage_rows_device dedups repeated
    # documents by identity (a padded tail costs id-map bytes + masked
    # compute), while stage_rows_upload would physically re-quantize and
    # re-upload the duplicated rows over the ~45 MB/s tunnel — there, a
    # one-off tail compile is cheaper than paying real bytes every run.
    n_pairs_total = len(loaded) + len(fused_loaded)
    from svecalign_tpu.vecalign.batch import shape_grid_enabled

    pad_tail = shape_grid_enabled() and n_pairs_total > pair_batch

    def pad_bucket(bucket, tail_to=None):
        """Repeat the last pair up to the target P (full pair_batch for
        device-staged tail buckets, and/or an even split over the mesh);
        the duplicates' outputs are dropped by the result zip."""
        target = tail_to if tail_to else len(bucket)
        if sharding is not None:
            n_dev = sharding.mesh.size
            target += -target % n_dev
        return bucket + bucket[-1:] * (target - len(bucket))

    def stage_upload(bucket):
        return stage_rows_upload(
            [(e0, i0, e1, i1) for _, e0, i0, e1, i1 in pad_bucket(bucket)],
            quantize=quant, sharding=sharding,
        )

    def stage_device(bucket):
        return stage_rows_device(
            [(e0, i0, e1, i1) for _, e0, i0, e1, i1 in pad_bucket(
                bucket, tail_to=pair_batch if pad_tail else None)],
            sharding=sharding,
        )

    buckets = []
    for items, stage_fn in ((loaded, stage_upload), (fused_loaded, stage_device)):
        items.sort(key=lambda it: it[2].shape[1] + it[4].shape[1])
        buckets += [
            (items[s0 : s0 + pair_batch], stage_fn)
            for s0 in range(0, len(items), pair_batch)
        ]

    # staging (pad + quantize + device_put) runs on a worker thread: in the
    # tunnel's post-D2H mode device_put blocks its calling thread, so
    # same-thread staging would serialize bucket i+1's upload with bucket
    # i's compute instead of overlapping them
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(1) as ex:
        fut = ex.submit(buckets[0][1], buckets[0][0]) if buckets else None
        for bi in my_tqdm(range(len(buckets))):
            bucket, _ = buckets[bi]
            t0 = time.perf_counter()
            handle = fut.result()
            if bi + 1 < len(buckets):
                fut = ex.submit(buckets[bi + 1][1], buckets[bi + 1][0])
            t1 = time.perf_counter()
            results = run_staged(handle, **kwargs)
            t2 = time.perf_counter()
            for (pair, *_), (aligns, scores) in zip(bucket, results):
                with open(pair.out_path, mode="w") as fp:
                    print_alignments(aligns, scores=scores, ofile=fp)
            t3 = time.perf_counter()
            prof["stage"] += t1 - t0
            prof["pyramid"] += t2 - t1
            prof["write"] += t3 - t2
            if profile:
                v0 = handle[0]
                logger.info(
                    f"align profile: bucket {bi} P={v0.shape[0]} "
                    f"n={v0.shape[2]} m={handle[1].shape[2]} "
                    f"stage_wait={t1 - t0:.2f}s pyramid={t2 - t1:.2f}s "
                    f"write={t3 - t2:.2f}s"
                )
    if profile:
        logger.info(
            "align profile: load=%.2fs stage_wait=%.2fs pyramid=%.2fs "
            "write=%.2fs (%d buckets)"
            % (prof["load"], prof["stage"], prof["pyramid"], prof["write"],
               len(buckets))
        )


def _run_pairs(args, valid_pairs):
    for pair in my_tqdm(valid_pairs):
        vecalign_func(
            src=pair.segs[0],
            tgt=pair.segs[1],
            src_embed=[pair.concats[0], pair.embeds[0]],
            src_stopes=args.is_stopes_embed,
            src_fp16=args.fp16_embed,
            tgt_embed=[pair.concats[1], pair.embeds[1]],
            tgt_stopes=args.is_stopes_embed,
            tgt_fp16=args.fp16_embed,
            alignment_max_size=args.alignment_max_size,
            many_to_one=None,
            search_buffer_size=args.search_buffer_size,
            del_percentile_frac=args.del_percentile_frac,
            max_size_full_dp=args.max_size_full_dp,
            costs_sample_size=args.costs_sample_size,
            num_samps_for_norm=args.num_samps_for_norm,
            overlap_segments=True,
            print_aligned_text=False,
            print_results=True,
            save_aligned_text_to_file=pair.out_path,
            verbose=False,
            src_ignore_indices=pair.ignores[0],
            tgt_ignore_indices=pair.ignores[1],
            seed=args.seed,
            dp_backend=args.dp_backend,
        )


if __name__ == "__main__":
    main()
