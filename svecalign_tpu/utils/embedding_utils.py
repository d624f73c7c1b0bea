"""Embedding IO and the overlap-tensor construction.

File formats (reference svecalign/utils/embedding_utils.py:38-74):

- "stopes" ``.embed``  : a standard ``.npy`` file, usually fp16, shape (N, 1024)
- "numpy raw" ``.embed``: headerless raw fp16/fp32 binary, reshaped to N x 1024

Both load to float32. The overlap tensor layout matches reference
embedding_utils.py:135-203: ``out[j, i+j, :]`` holds the embedding of
segments i..i+j (the j+1-segment overlap STARTING at i, stored diagonally so
that index 2 of the tensor is the END position).
"""

from typing import Dict, List, Optional, Set, Tuple

import numpy as np

from svecalign_tpu.utils.log_utils import logging

logger = logging.getLogger(__name__)

EMBED_DIM = 1024
PAD_LABEL = "PAD"


def preprocess_line(line: str) -> str:
    line = line.strip()
    if len(line) == 0:
        logger.warning("Encountered empty line.")
        line = "[BLANK_LINE]"
    return line


def load_stopes_embeddings(path: str, mode: str = "mmap") -> np.ndarray:
    """Load a stopes-style .embed (= standard .npy), returning float32."""
    mmap_mode = "r" if mode == "mmap" else None
    arr = np.load(path, mmap_mode=mmap_mode)
    return np.asarray(arr, dtype=np.float32)


def write_stopes_embedding(arr: np.ndarray, path: str, fp16: bool = True) -> None:
    """Write an (N, dim) embedding as a standard .npy file (stopes-compatible)."""
    out = arr.astype(np.float16 if fp16 else np.float32)
    with open(path, "wb") as fp:
        np.lib.format.write_array(fp, out, allow_pickle=False)


def append_stopes_embedding(paths: List[str], out_path: str, fp16: bool = True) -> int:
    """Concatenate several .embed files into one (stopes EmbeddingConcatenator
    equivalent, reference prep_index.py:129-150). Returns the total row count."""
    arrays = [load_stopes_embeddings(p, mode="memory") for p in paths]
    combined = np.concatenate(arrays, axis=0) if arrays else np.zeros((0, EMBED_DIM))
    write_stopes_embedding(combined, out_path, fp16=fp16)
    return combined.shape[0]


def load_np_embeddings(embed_file: str, fp16_embed: bool) -> np.ndarray:
    """Load a headerless raw binary embedding (SONAR-style), returning float32."""
    dtype = np.float16 if fp16_embed else np.float32
    return np.fromfile(embed_file, dtype=dtype, count=-1).astype(np.float32)


def write_np_embeddings(arr: np.ndarray, path: str, fp16: bool = True) -> None:
    """Write a headerless raw binary embedding (SONAR-style)."""
    arr.astype(np.float16 if fp16 else np.float32).tofile(path)


def load_sent_embeddings(
    embed_file: str,
    use_stopes: bool = False,
    fp16_embed: bool = False,
    stopes_mode: str = "mmap",
) -> np.ndarray:
    """Load either .embed flavor as a float32 (N, EMBED_DIM) matrix."""
    if use_stopes:
        embeddings = load_stopes_embeddings(embed_file, mode=stopes_mode)
    else:
        embeddings = load_np_embeddings(embed_file, fp16_embed)
        if embeddings.size == 0:
            raise Exception("Got empty embedding file")
        embeddings = embeddings.reshape(embeddings.shape[0] // EMBED_DIM, EMBED_DIM)
    assert embeddings.dtype == np.float32, embed_file
    return embeddings


def read_sent2id(text_file: str) -> Dict[str, int]:
    """Candidate line -> embedding row id; duplicates keep the first.

    The row order is the concat file's line order (the stage-5.1/5.3
    contract, reference seg_align/concat_segs.py:118). Split out of
    :func:`read_in_embeddings` for the fused pipeline, where the rows
    themselves are already on device and the .embed file is never read.
    """
    sent2line: Dict[str, int] = {}
    with open(text_file, "rt", encoding="utf-8") as fin:
        for i, line in enumerate(fin):
            key = line.strip()
            if key in sent2line:
                continue  # duplicate lines share an embedding
            sent2line[key] = i
    return sent2line


def read_in_embeddings(
    text_file: str,
    embed_file: str,
    use_stopes: bool = False,
    fp16_embed: bool = False,
) -> Tuple[Dict[str, int], np.ndarray]:
    """Map each candidate line to its embedding row; duplicates keep the first."""
    return (
        read_sent2id(text_file),
        load_sent_embeddings(embed_file, use_stopes, fp16_embed),
    )


def make_overlap(
    lines: List[str],
    num_overlaps: int,
    start_id: int,
    ignore_indices: Optional[Set[Tuple[int, int]]] = None,
    comb: str = " ",
    overlap_segments: bool = False,
) -> List[str]:
    """Enumerate the overlap keys starting at ``start_id``.

    For speech (``overlap_segments=True``) the key of overlap (i..j) is
    ``"start_of_i end_of_j"``. When an ignore index (i, j) is hit, the
    remaining overlaps are PAD (zero embedding, blocks alignment).
    """
    res: List[str] = []
    for n_over in range(num_overlaps):
        j = start_id + n_over
        if j >= len(lines):
            break
        if ignore_indices and (start_id, j) in ignore_indices:
            res.extend([PAD_LABEL] * (min(len(lines), start_id + num_overlaps) - j))
            break
        if overlap_segments:
            res.append(f"{lines[start_id].split()[0]} {lines[j].split()[1]}")
        else:
            res.append(comb.join(lines[start_id : j + 1]))
    return res


def make_doc_ids(
    sent2id: Dict[str, int],
    n_rows: int,
    lines: List[str],
    max_overlaps: int,
    ignore_indices: Optional[Set[Tuple[int, int]]] = None,
    overlap_segments: bool = False,
) -> np.ndarray:
    """Index-map form of :func:`make_doc_embedding`: ``out[j, i+j]`` is the
    embedding ROW of segments i..i+j, or -1 for missing/PAD. Uploading the
    raw (n_rows, dim) embedding + this small int map and gathering on device
    is ~2x cheaper than uploading the materialized overlap tensor (each row
    appears in several overlap planes)."""
    lines = [preprocess_line(line) for line in lines]
    out = np.full((max_overlaps, len(lines)), -1, dtype=np.int32)
    for i in range(len(lines)):
        keys = make_overlap(
            lines, max_overlaps, start_id=i,
            ignore_indices=ignore_indices, overlap_segments=overlap_segments,
        )
        for j, key in enumerate(keys):
            line_id = None if key == PAD_LABEL else sent2id.get(key)
            if line_id is not None:
                if not 0 <= line_id < n_rows:
                    # a truncated .embed file must not silently degrade
                    # alignments (reference make_doc_embedding raises
                    # IndexError on a bad row, embedding_utils.py:135-203)
                    raise IndexError(
                        f"embedding row {line_id} for overlap '{key}' is out "
                        f"of range for a {n_rows}-row .embed file — "
                        "truncated or mismatched embedding file?"
                    )
                out[j, i + j] = line_id
    return out


def make_doc_embedding(
    sent2id: Dict[str, int],
    line_embeddings: np.ndarray,
    lines: List[str],
    max_overlaps: int,
    ignore_indices: Optional[Set[Tuple[int, int]]] = None,
    overlap_segments: bool = False,
    dtype=np.float32,
) -> np.ndarray:
    """Build the (max_overlaps, n_lines, dim) overlap tensor.

    ``out[j, i+j]`` = embedding of segments i..i+j. Missing keys, PAD markers
    and NaN rows become zero vectors, which prevents those spans from being
    aligned. ``dtype=float16`` halves host->device transfer (the source
    .embed files are fp16 anyway); compute upcasts to fp32 on device.
    """
    lines = [preprocess_line(line) for line in lines]
    embed_dim = line_embeddings.shape[1]

    n_miss = n_match = 0
    out = np.zeros((max_overlaps, len(lines), embed_dim), dtype=dtype)

    for i in range(len(lines)):
        keys = make_overlap(
            lines,
            max_overlaps,
            start_id=i,
            ignore_indices=ignore_indices,
            overlap_segments=overlap_segments,
        )
        for j, key in enumerate(keys):
            line_id = None if key == PAD_LABEL else sent2id.get(key)
            if line_id is not None:
                vec = line_embeddings[line_id]
                if np.any(np.isnan(vec)):
                    n_miss += 1
                    logger.error(
                        f"loaded a vector with nan value at {line_id} with overlap "
                        f"{key}. Will reset to zero."
                    )
                    vec = np.zeros((embed_dim,), dtype=np.float32)
                else:
                    n_match += 1
            else:
                vec = np.zeros((embed_dim,), dtype=np.float32)
                n_miss += 1
            out[j, i + j, :] = vec

    logger.debug(f"Match: {n_match} || Miss: {n_miss}")
    return out
