"""Stage 6.7 — margin-score alignments with the per-language k-NN indexes.

For each pair: load src/tgt embeddings from the pointer tsvs, L2-normalize,
k-NN search (k=16) each side against the OTHER language's index, and score
``margin = cos(x, y) / ((avg_kNN_xy + avg_kNN_yx) / 2)`` (ratio; or the
distance variant). L2^2 -> cosine uses ``cos = (2 - L2^2) / 2``. The per-row
margin loop of the reference becomes one vectorized op. (Reference
svecalign/postprocess/score_align.py — faiss replaced by ops/topk.py.)

CLI: ``python -m svecalign_tpu.postprocess.score_align METADATA OUT_DIR
--embed_dir E --align_dir A --src_lang S --tgt_lang T --index_dir I
[--num_probe 128] [--embed_fp16] [--embed_stopes] [--margin ratio] [--k 16]``
"""

import argparse
from pathlib import Path
from typing import List, Tuple

import numpy as np

from svecalign_tpu.ops.topk import normalize_l2
from svecalign_tpu.postprocess.prep_index import (
    load_embed_from_entries,
    parse_embed_tsv_entries,
)
from svecalign_tpu.utils.file_utils import read_alignments, read_metadata
from svecalign_tpu.utils.index_utils import load_index
from svecalign_tpu.utils.log_utils import logging, my_tqdm

logger = logging.getLogger(__name__)


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("metadata", type=str,
                        help="the meta file that each line contains paired audio paths")
    parser.add_argument("out_dir", type=str,
                        help="dir to store the margin-scored alignments.")
    parser.add_argument("--embed_dir", type=str, required=True,
                        help="the dir for embedding tsvs.")
    parser.add_argument("--align_dir", type=str, required=True,
                        help="the dir for concatenated alignments.")
    parser.add_argument("--src_lang", type=str, required=True)
    parser.add_argument("--tgt_lang", type=str, required=True)
    parser.add_argument("--index_dir", type=str, required=True,
                        help="where the indexes are saved.")
    parser.add_argument("--num_probe", type=int, default=128)
    parser.add_argument("--gpu_type", type=str, default="fp16-shard",
                        help="accepted for CLI parity; sharding is decided by the device mesh.")
    parser.add_argument("--embed_fp16", action="store_true", default=False)
    parser.add_argument("--embed_stopes", action="store_true", default=False)
    parser.add_argument("--margin", type=str, default="ratio",
                        help="Margin for xSIM calculation: ratio or distance.")
    parser.add_argument("--k", type=int, default=16, help="number of nearest neighbors.")
    parser.add_argument("--query_upload", type=str, default="fp32",
                        choices=["fp32", "fp16"],
                        help="query host->device staging precision: fp16 "
                             "halves the bytes over the tunnel (~1e-3 "
                             "relative margin noise); fp32 is exact.")
    parser.add_argument("--sharded_index", action="store_true", default=False,
                        help="shard the corpus row-wise across all devices "
                             "(for corpora exceeding one chip's HBM).")
    parser.add_argument("--corpus_quant", type=str, default="fp16",
                        choices=["fp16", "int8"],
                        help="device-corpus precision for Flat indexes: "
                             "int8 halves fp16's HBM (2x single-chip corpus "
                             "headroom) and searches with a single-pass "
                             "bf16 matmul (~1e-3 relative margin noise); "
                             "fp16 is exact vs faiss. Flat and sharded-Flat "
                             "corpora; IVF keeps fp16.")
    return parser.parse_args()


def find_valid_metas(meta: List[Tuple[str, str]], embed_dir: Path) -> List[str]:
    res = []
    for src_aud, tgt_aud in meta:
        src_id = Path(src_aud).stem
        tgt_id = Path(tgt_aud).stem
        src_tsv = embed_dir / f"{src_id}-{tgt_id}.src.tsv"
        tgt_tsv = embed_dir / f"{src_id}-{tgt_id}.tgt.tsv"
        if src_tsv.exists() and tgt_tsv.exists():
            res.append(f"{src_id}-{tgt_id}")
        elif not src_tsv.exists() and not tgt_tsv.exists():
            logger.warning(f"{src_tsv} and {tgt_tsv} not exist")
        else:
            raise Exception(f"{src_tsv}: {src_tsv.exists()} | {tgt_tsv}: {tgt_tsv.exists()}")
    logger.info(f"Kept {len(res)}/{len(meta)}")
    return res


def write_to_output(
    align_dir: Path, align_ids: List[str], margin_scores: np.ndarray, out_dir: Path
) -> None:
    margin_id = 0
    for ali_id in align_ids:
        alignments = read_alignments(align_dir / f"{ali_id}.txt")
        with open(out_dir / f"{ali_id}.txt", mode="w") as fp:
            for src, tgt in alignments:
                fp.write(f"{src}:{tgt}:{margin_scores[margin_id]}\n")
                margin_id += 1
    assert margin_id == margin_scores.shape[0], f"{margin_id}, {margin_scores.shape}"


def l2_sq_to_cosine(x: np.ndarray) -> np.ndarray:
    """cos = (2 - L2^2) / 2 for unit vectors (reference score_align.py:118-121)."""
    return (2.0 - x) / 2.0


def compute_margin(
    idx_x, idx_y, x: np.ndarray, y: np.ndarray, k: int, margin: str
) -> np.ndarray:
    """Margin scores for row-paired (x_i, y_i); both sides search the other
    language's index. Vectorized version of reference score_align.py:124-161."""
    num_x, dim_x = x.shape
    num_y, dim_y = y.shape
    assert num_x == num_y and dim_x == dim_y, f"{x.shape} {y.shape}"

    x = normalize_l2(x)
    y = normalize_l2(y)

    l2_xy, _ = idx_y.search(x, k)  # (num_x, k)
    l2_yx, _ = idx_x.search(y, k)

    avg_xy = l2_sq_to_cosine(l2_xy.mean(axis=1))
    avg_yx = l2_sq_to_cosine(l2_yx.mean(axis=1))

    a = np.einsum("nd,nd->n", x, y)
    b = (avg_xy + avg_yx) / 2.0
    if margin == "ratio":
        return (a / b).astype(np.float32)
    if margin == "distance":
        return (a - b).astype(np.float32)
    raise ValueError(f"Wrong margin type: {margin}")


def _margin_device_fn():
    """Jitted margin over device-resident normalized queries + kNN results
    (created lazily so the module imports without jax)."""
    global _margin_device_cached
    if _margin_device_cached is None:
        from functools import partial

        import jax
        import jax.numpy as jnp

        @partial(jax.jit, static_argnames=("margin",))
        def margin_fn(qx, qy, l2_xy, l2_yx, margin):
            avg_xy = (2.0 - jnp.mean(l2_xy, axis=1)) / 2.0
            avg_yx = (2.0 - jnp.mean(l2_yx, axis=1)) / 2.0
            a = jnp.einsum("nd,nd->n", qx, qy)
            b = (avg_xy + avg_yx) / 2.0
            return a / b if margin == "ratio" else a - b

        _margin_device_cached = margin_fn
    return _margin_device_cached


_margin_device_cached = None


def compute_margin_device(idx_x, idx_y, qx, qy, n: int, k: int, margin: str) -> np.ndarray:
    """Fused-pipeline margin: ``qx``/``qy`` are (n_padded, dim) fp16 device
    rows straight from the embed cache gather — normalization, both kNN
    searches and the margin formula all run on device; only the final (n,)
    float32 margins cross to the host. Equals :func:`compute_margin` up to
    fp32 summation order (~1e-6 relative)."""
    from svecalign_tpu.ops.topk import normalize_rows_device

    assert margin in ("ratio", "distance"), f"Wrong margin type: {margin}"
    qx = normalize_rows_device(qx)
    qy = normalize_rows_device(qy)
    l2_xy, _ = idx_y.search_device_queries(qx, k)
    l2_yx, _ = idx_x.search_device_queries(qy, k)
    m = _margin_device_fn()(qx, qy, l2_xy, l2_yx, margin)
    return np.asarray(m)[:n].astype(np.float32)


def main():
    args = parse_args()
    logger.info(args)

    all_pairs = read_metadata(args.metadata)
    logger.info(f"fp16: {args.embed_fp16} | stopes: {args.embed_stopes}")
    logger.info(f"margin: {args.margin} | k: {args.k}")

    src_lang, tgt_lang = args.src_lang, args.tgt_lang
    embed_dir = Path(args.embed_dir) / f"{src_lang}-{tgt_lang}"
    align_dir = Path(args.align_dir) / f"{src_lang}-{tgt_lang}"

    out_dir = Path(args.out_dir) / f"{src_lang}-{tgt_lang}"
    out_dir.mkdir(parents=True, exist_ok=True)

    metas = find_valid_metas(all_pairs, embed_dir)
    del all_pairs
    if not metas:
        logger.warning("no pairs with embedding tsvs; nothing to score")
        return

    index_dir = Path(args.index_dir) / f"{src_lang}-{tgt_lang}"
    src_index_path = list((index_dir / src_lang).glob("*.populate.idx"))[0]
    tgt_index_path = list((index_dir / tgt_lang).glob("*.populate.idx"))[0]

    logger.info(f"Loading {src_index_path}")
    src_index = load_index(src_index_path, nprobe=args.num_probe)
    logger.info(f"Loading {tgt_index_path}")
    tgt_index = load_index(tgt_index_path, nprobe=args.num_probe)
    if args.query_upload == "fp16":
        src_index.query_upload = tgt_index.query_upload = "float16"
        logger.info("Queries stage to device as fp16 (half the tunnel bytes)")

    if args.corpus_quant == "int8" and not args.sharded_index:
        from svecalign_tpu.ops.topk import FlatIndex as _Flat

        if isinstance(src_index, _Flat) and isinstance(tgt_index, _Flat):
            src_index.corpus_quant = tgt_index.corpus_quant = "int8"
            logger.info("Device corpora quantize to int8 (half fp16 HBM, "
                        "single-pass bf16 search; ~1e-3 margin noise)")
        else:
            logger.warning("--corpus_quant int8 only applies to Flat "
                           "indexes; loaded %s/%s keep fp16",
                           type(src_index).__name__, type(tgt_index).__name__)

    if args.sharded_index:
        # shard whatever index type was loaded — the reference's fp16-shard
        # spreads the loaded index (Flat OR IVF) across local GPUs
        # (reference score_align.py:48-49,201-217); here the corpus rows
        # (Flat) or list-sorted blocks (IVF) spread over the device mesh
        from svecalign_tpu.ops.topk import (
            FlatIndex,
            IVFIndex,
            ShardedFlatIndex,
            ShardedIVFIndex,
        )

        def shard(ix):
            if isinstance(ix, FlatIndex):
                return ShardedFlatIndex(
                    ix.corpus, query_upload=ix.query_upload,
                    corpus_quant="int8" if args.corpus_quant == "int8"
                    else "none",
                )
            if isinstance(ix, IVFIndex):
                if args.corpus_quant == "int8":
                    logger.warning("--corpus_quant int8 only applies to "
                                   "Flat corpora; sharded IVF keeps fp16")
                return ShardedIVFIndex(ix, query_upload=ix.query_upload)
            return ix  # already sharded (or a live registry handoff)

        src_index = shard(src_index)
        tgt_index = shard(tgt_index)
        logger.info(
            f"Sharding corpora across the device mesh "
            f"({type(src_index).__name__} / {type(tgt_index).__name__})"
        )

    # batch the queries of many pairs into large chunks: margin scoring is
    # row-wise, so scores are identical, but each chunk costs ONE search per
    # direction instead of one per pair
    CHUNK_ROWS = 65536
    margin_scores = []
    buf_rows = 0

    # fused pipeline: when the embed stages left the rows in the device
    # cache and the indexes support device-resident queries (Flat, IVF and
    # both sharded variants all do), each chunk is resolved by one
    # on-device gather per side — no query upload at all
    from svecalign_tpu.utils import embed_cache

    if min(src_index.ntotal, tgt_index.ntotal) < args.k:
        # faiss pads missing neighbors with huge distances, so the k-mean
        # in the margin formula degenerates for corpora smaller than k —
        # the reference behaves identically; surface it instead of
        # emitting silently meaningless scores
        logger.warning(
            f"index smaller than k={args.k} "
            f"(src {src_index.ntotal}, tgt {tgt_index.ntotal}): margin "
            "denominators include +inf padding and scores will collapse; "
            "lower --k to at most the corpus size"
        )

    use_device = (
        embed_cache.enabled
        and hasattr(src_index, "search_device_queries")
        and hasattr(tgt_index, "search_device_queries")
        and min(src_index.ntotal, tgt_index.ntotal) >= args.k
    )
    if use_device:
        logger.info("Fused mode: resolving queries from the device embed cache")

    def flush_device(src_entries, tgt_entries) -> bool:
        gs = embed_cache.gather_rows_device(src_entries)
        gt = embed_cache.gather_rows_device(tgt_entries)
        if gs is None or gt is None:
            return False
        assert gs[1] == gt[1], (gs[1], gt[1])
        margin_scores.append(
            compute_margin_device(
                src_index, tgt_index, gs[0], gt[0], gs[1], args.k, args.margin
            )
        )
        return True

    def flush_host(src_entries, tgt_entries) -> None:
        src = load_embed_from_entries(
            src_entries, fp16_embed=args.embed_fp16, use_stopes=args.embed_stopes
        )
        tgt = load_embed_from_entries(
            tgt_entries, fp16_embed=args.embed_fp16, use_stopes=args.embed_stopes
        )
        margin_scores.append(
            compute_margin(src_index, tgt_index, src, tgt, args.k, args.margin)
        )

    buf_src_e, buf_tgt_e = [], []

    def flush():
        nonlocal buf_src_e, buf_tgt_e, buf_rows
        if not buf_src_e:
            return
        if not (use_device and flush_device(buf_src_e, buf_tgt_e)):
            flush_host(buf_src_e, buf_tgt_e)
        buf_src_e, buf_tgt_e, buf_rows = [], [], 0

    # each pointer tsv is parsed exactly once; the parsed entries feed the
    # device gather directly (fused) or the file loader (fallback)
    for align_id in my_tqdm(metas):
        src_e = parse_embed_tsv_entries(embed_dir / f"{align_id}.src.tsv")
        tgt_e = parse_embed_tsv_entries(embed_dir / f"{align_id}.tgt.tsv")
        buf_src_e.extend(src_e)
        buf_tgt_e.extend(tgt_e)
        buf_rows += len(src_e)
        if buf_rows >= CHUNK_ROWS:
            flush()
    flush()
    margin_scores = np.concatenate(margin_scores, axis=0)

    logger.info(f"Writing to {out_dir}...")
    write_to_output(align_dir, metas, margin_scores, out_dir)
    logger.info("Done!")


if __name__ == "__main__":
    main()
