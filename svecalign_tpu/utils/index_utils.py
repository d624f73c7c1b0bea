"""Index file IO and type selection.

Flat indexes are stored in the faiss ``IndexFlatL2`` binary format
(fourcc ``IxF2``) for byte-level interop: our stages can load indexes
written by the reference's faiss pipeline and vice versa. IVF indexes use a
simple native .npz container. (Replaces stopes train_index / load_index —
reference svecalign/utils/mining_utils.py:14-42, score_align.py:192-217.)
"""

import struct
from pathlib import Path
from typing import Union

import numpy as np

from svecalign_tpu.ops.topk import FlatIndex, IVFIndex
from svecalign_tpu.utils.log_utils import logging

logger = logging.getLogger(__name__)

_FLAT_MAGIC = b"IxF2"
_IVF_MAGIC = "svecalign_ivf"


def determine_index_type(n_embeddings: int) -> str:
    """Pick an index type by corpus size (role of stopes
    determine_faiss_index_type, reference prep_index.py:246).

    Exact streaming Flat is both faster and exact while the corpus fits one
    chip's HBM (~4M x 1024 fp16 — fp16-sourced corpora are stored fp16 on
    device and upcast exactly in the kernels — sweepable at MXU speed); IVF
    only beyond that, where sharding + clustering start to pay."""
    if n_embeddings < 4_000_000:
        return "Flat"
    if n_embeddings < 20_000_000:
        return "IVF16384"
    return "IVF131072"


def write_flat_index(vectors: np.ndarray, path: Union[str, Path]) -> None:
    """Write vectors as a faiss-compatible IndexFlatL2 file."""
    vectors = np.ascontiguousarray(vectors, dtype=np.float32)
    ntotal, d = vectors.shape
    with open(path, "wb") as fp:
        fp.write(_FLAT_MAGIC)
        fp.write(struct.pack("<i", d))
        fp.write(struct.pack("<q", ntotal))
        fp.write(struct.pack("<qq", 1 << 20, 1 << 20))  # legacy fields
        fp.write(struct.pack("<B", 1))  # is_trained
        fp.write(struct.pack("<i", 1))  # METRIC_L2
        fp.write(struct.pack("<Q", ntotal * d))
        fp.write(vectors.tobytes())


def read_flat_index(path: Union[str, Path]) -> np.ndarray:
    """Read a faiss IndexFlatL2 file into an (ntotal, d) float32 matrix."""
    with open(path, "rb") as fp:
        magic = fp.read(4)
        if magic != _FLAT_MAGIC:
            raise ValueError(f"{path}: not a Flat (IxF2) index (got {magic!r})")
        d, = struct.unpack("<i", fp.read(4))
        ntotal, = struct.unpack("<q", fp.read(8))
        fp.read(16)  # legacy
        fp.read(1)  # is_trained
        metric, = struct.unpack("<i", fp.read(4))
        assert metric == 1, f"only METRIC_L2 supported, got {metric}"
        n, = struct.unpack("<Q", fp.read(8))
        assert n == ntotal * d, (n, ntotal, d)
        data = np.frombuffer(fp.read(n * 4), dtype=np.float32)
    return data.reshape(ntotal, d)


def write_ivf_index(index: IVFIndex, path: Union[str, Path]) -> None:
    # write through a file object so np.savez cannot append ".npz" and
    # break the `${type}.populate.idx` filename contract
    with open(path, "wb") as fp:
        np.savez(
            fp,
            magic=_IVF_MAGIC,
            centroids=index.centroids,
            vectors=index._vectors,
            assignments=index._assignments,
            nprobe=index.nprobe,
        )


def load_index(
    path: Union[str, Path], index_type: str = "Flat", nprobe: int = 128
) -> Union[FlatIndex, IVFIndex]:
    """Load a populated index file, auto-detecting the container."""
    path = str(path)
    with open(path, "rb") as fp:
        head = fp.read(4)
    if head == _FLAT_MAGIC:
        vectors = read_flat_index(path)
        idx = FlatIndex(dim=vectors.shape[1])
        if vectors.shape[0]:
            idx.add(vectors)
        return idx
    # npz container (IVF)
    data = np.load(path, allow_pickle=False)
    assert str(data["magic"]) == _IVF_MAGIC, path
    idx = IVFIndex(
        dim=data["centroids"].shape[1],
        nlist=data["centroids"].shape[0],
        nprobe=int(data["nprobe"]) if "nprobe" in data else nprobe,
    )
    idx.centroids = data["centroids"]
    idx._vectors = data["vectors"]
    idx._assignments = data["assignments"]
    idx.nprobe = nprobe
    return idx
