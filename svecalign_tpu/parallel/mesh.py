"""Device-mesh helpers and SPMD sharding rules.

The reference's entire "distributed backend" is file-level sharding
(SURVEY.md section 5.8); device-level parallelism did not exist. Here the
ICI level is expressed as one ``jax.sharding.Mesh``:

- ``data`` axis: batch-parallel encoder inference / training;
- ``model`` axis: tensor-parallel transformer FFN + attention-head sharding
  for large encoders and for sharding the k-NN corpus.

Host-level (DCN) sharding keeps the reference's --rank/--n_shard file
contract (utils/mp_utils.py).
"""

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    model_parallel: int = 1,
    axis_names: Tuple[str, str] = ("data", "model"),
) -> Mesh:
    """Build a (data, model) mesh over the first ``n_devices`` devices."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    assert n_devices <= len(devices), (n_devices, len(devices))
    assert n_devices % model_parallel == 0
    grid = np.array(devices[:n_devices]).reshape(
        n_devices // model_parallel, model_parallel
    )
    return Mesh(grid, axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def encoder_param_spec(path: Tuple[str, ...], value) -> P:
    """Tensor-parallel partition rule for the speech encoders.

    FFN expansions split the hidden dim over 'model'; contractions split the
    input dim; attention projections split heads (their feature dim); conv
    and norm params replicate.
    """
    name = "/".join(str(p) for p in path)
    if value.ndim < 2:
        return P()
    if "ffn_in" in name and name.endswith("kernel"):
        return P(None, "model")
    if "ffn1_in" in name or "ffn2_in" in name:
        return P(None, "model") if name.endswith("kernel") else P()
    if "ffn_out" in name and name.endswith("kernel"):
        return P("model", None)
    if "ffn1_out" in name or "ffn2_out" in name:
        return P("model", None) if name.endswith("kernel") else P()
    if ("attn" in name and name.endswith("kernel")) and "out" not in name:
        # (embed, heads, head_dim) fused kernels in flax MHA
        if value.ndim == 3:
            return P(None, "model", None)
        return P(None, "model")
    if "attn/out/kernel" in name and value.ndim == 3:
        return P("model", None, None)
    return P()


def shard_params(params, mesh: Mesh):
    """Apply the encoder partition rules to a param pytree."""
    from flax.traverse_util import flatten_dict, unflatten_dict

    flat = flatten_dict(params)
    out = {}
    for path, value in flat.items():
        spec = encoder_param_spec(path, value)
        out[path] = jax.device_put(value, NamedSharding(mesh, spec))
    return unflatten_dict(out)
