"""Contrastive fine-tuning of the speech encoder on mined pairs.

The reference has no training loop (its encoders are frozen external
checkpoints); this subsystem closes the mining loop: the tsvs the pipeline
mines (prep_tsv output) are exactly paired speech clips, and a contrastive
(InfoNCE, LASER-style) objective on them adapts the encoder to the mined
domain. Also serves as the framework's canonical multi-chip training step:
batch sharded over the ``data`` mesh axis, encoder FFN/attention tensors
sharded over ``model`` (parallel/mesh.py rules); XLA inserts the
all-reduces.
"""

import dataclasses



import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from svecalign_tpu.models.laser_encoder import LaserEncoderConfig, LaserSpeechEncoder
from svecalign_tpu.parallel.mesh import encoder_param_spec


@dataclasses.dataclass
class TrainConfig:
    learning_rate: float = 1e-4
    weight_decay: float = 0.01
    temperature: float = 0.05


def info_nce_loss(emb0: jax.Array, emb1: jax.Array, temperature: float) -> jax.Array:
    """Symmetric InfoNCE over in-batch negatives (paired rows are positives)."""
    e0 = emb0 / (jnp.linalg.norm(emb0, axis=-1, keepdims=True) + 1e-6)
    e1 = emb1 / (jnp.linalg.norm(emb1, axis=-1, keepdims=True) + 1e-6)
    logits = jnp.dot(e0, e1.T, preferred_element_type=jnp.float32) / temperature
    labels = jnp.arange(logits.shape[0])
    loss01 = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    loss10 = optax.softmax_cross_entropy_with_integer_labels(logits.T, labels)
    return (loss01.mean() + loss10.mean()) / 2


def make_train_state(
    model_config: LaserEncoderConfig,
    train_config: TrainConfig = TrainConfig(),
    seed: int = 0,
    example_len: int = 16000,
):
    """(model, params, opt, opt_state) with freshly initialized params."""
    model = LaserSpeechEncoder(model_config)
    params = model.init(
        jax.random.PRNGKey(seed),
        jnp.zeros((1, example_len), jnp.float32),
        jnp.array([example_len]),
    )
    opt = optax.adamw(
        train_config.learning_rate, weight_decay=train_config.weight_decay
    )
    opt_state = opt.init(params)
    return model, params, opt, opt_state


def make_train_step(model: LaserSpeechEncoder, opt, train_config: TrainConfig):
    """One jittable update step: forward both sides, InfoNCE, adamw."""

    def loss_fn(params, batch):
        emb0 = model.apply(params, batch["src_wav"], batch["src_len"])
        emb1 = model.apply(params, batch["tgt_wav"], batch["tgt_len"])
        return info_nce_loss(emb0, emb1, train_config.temperature)

    def train_step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step


def shard_train_step(
    model: LaserSpeechEncoder,
    opt,
    train_config: TrainConfig,
    mesh: Mesh,
    params,
    opt_state,
):
    """jit the train step over a mesh with dp (batch) + tp (params) shardings.

    Returns (jitted_step, sharded_params, sharded_opt_state).
    """
    from flax.traverse_util import flatten_dict, unflatten_dict

    def spec_tree(tree):
        flat = flatten_dict(tree)
        return unflatten_dict(
            {k: NamedSharding(mesh, encoder_param_spec(k, v)) for k, v in flat.items()}
        )

    param_shardings = spec_tree(params)
    # optimizer state mirrors the param tree structurally; replicate scalars
    opt_shardings = jax.tree.map(
        lambda v: NamedSharding(
            mesh,
            P(),
        ),
        opt_state,
    )
    batch_sharding = {
        "src_wav": NamedSharding(mesh, P("data", None)),
        "src_len": NamedSharding(mesh, P("data")),
        "tgt_wav": NamedSharding(mesh, P("data", None)),
        "tgt_len": NamedSharding(mesh, P("data")),
    }

    step = make_train_step(model, opt, train_config)
    jitted = jax.jit(
        step,
        in_shardings=(param_shardings, opt_shardings, batch_sharding),
        out_shardings=(param_shardings, opt_shardings, NamedSharding(mesh, P())),
    )

    params = jax.device_put(params, param_shardings)
    opt_state = jax.device_put(opt_state, opt_shardings)
    return jitted, params, opt_state
