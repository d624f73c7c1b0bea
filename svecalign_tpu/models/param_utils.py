"""Parameter init/IO helpers shared by the JAX models.

``numpy_init`` builds a parameter tree from ``jax.eval_shape`` without
compiling the XLA init program — on the tunneled TPU backend every compile
costs tens of seconds, and random weights don't need device RNG anyway.
"""

from typing import Tuple

import jax
import numpy as np


def numpy_init_leaf(path, leaf, rng: np.random.Generator):
    """One leaf of the numpy init: kernels ~ N(0, 1/fan_in), biases 0,
    norm scales 1 (host array; upload happens at the final device_put)."""
    name = path[-1]
    if name == "scale":
        val = np.ones(leaf.shape, np.float32)
    elif name == "bias":
        val = np.zeros(leaf.shape, np.float32)
    else:
        fan_in = int(np.prod(leaf.shape[:-1])) or 1
        val = rng.normal(0.0, fan_in**-0.5, leaf.shape).astype(np.float32)
    return val.astype(leaf.dtype)


def numpy_init(model, example_args: Tuple, seed: int = 0):
    """Initialize a flax model's params with numpy: kernels ~ N(0, 1/fan_in),
    biases 0, norm scales 1."""
    from flax.traverse_util import flatten_dict, unflatten_dict

    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(seed), *example_args)
    rng = np.random.default_rng(seed)
    flat = flatten_dict(shapes["params"])
    out = {}
    for path, leaf in flat.items():
        # HOST arrays, deliberately: the callers' final device_put decides
        # placement. A committed device-0 tree fed to
        # device_put(..., replicated-over-mesh) becomes a device->devices
        # collective transfer — which deadlocks XLA:CPU's 40 s rendezvous
        # for multi-GB trees on a 1-core host (and wastes a hop on real
        # chips); a host tree is plain per-device H2D.
        out[path] = numpy_init_leaf(path, leaf, rng)
    return {"params": unflatten_dict(out)}


def load_params_npz(path: str):
    """Load a flax param pytree from an .npz of flattened 'a/b/c' keys."""
    from flax.traverse_util import unflatten_dict

    data = np.load(path)
    # host arrays: see numpy_init — placement is the caller's device_put's
    # job, and pre-committing to device 0 turns a replicated put into a
    # collective transfer
    flat = {tuple(k.split("/")): np.asarray(v) for k, v in data.items()}
    return {"params": unflatten_dict(flat)}


def save_params_npz(params, path: str) -> None:
    from flax.traverse_util import flatten_dict

    flat = flatten_dict(params["params"])
    np.savez(path, **{"/".join(k): np.asarray(v) for k, v in flat.items()})
