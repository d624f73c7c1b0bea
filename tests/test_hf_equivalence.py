"""Numerical equivalence of the JAX encoder vs torch transformers.

Instantiates a small random ``transformers.Wav2Vec2Model`` (the architecture
family of SpeechLASER: feat_extract_norm="layer", do_stable_layer_norm=True),
converts its state dict with tools/convert_torch_ckpt.py's mapping, and
checks the JAX hidden states match torch's — proving that real converted
SpeechLASER/XLSR checkpoints produce correct embeddings.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp
from flax.traverse_util import unflatten_dict

from svecalign_tpu.models.laser_encoder import LaserEncoderConfig, LaserSpeechEncoder


@pytest.fixture(scope="module")
def models():
    from transformers import Wav2Vec2Config, Wav2Vec2Model

    hf_cfg = Wav2Vec2Config(
        hidden_size=64,
        num_hidden_layers=3,
        num_attention_heads=4,
        intermediate_size=128,
        conv_dim=[32, 32, 32],
        conv_kernel=[10, 3, 2],
        conv_stride=[5, 2, 2],
        conv_bias=True,
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
        do_stable_layer_norm=True,
        feat_extract_norm="layer",
        hidden_dropout=0.0,
        attention_dropout=0.0,
        feat_proj_dropout=0.0,
        layerdrop=0.0,
        apply_spec_augment=False,
    )
    torch.manual_seed(0)
    hf = Wav2Vec2Model(hf_cfg).eval()

    jcfg = LaserEncoderConfig(
        conv_layers=((32, 10, 5), (32, 3, 2), (32, 2, 2)),
        extractor_mode="layer",
        conv_bias=True,
        encoder_dim=64,
        encoder_layers=3,
        encoder_heads=4,
        encoder_ffn_dim=128,
        conv_pos_kernel=16,
        conv_pos_groups=4,
        dtype="float32",  # fp32 for a tight numerical comparison
    )
    jmodel = LaserSpeechEncoder(jcfg)

    import sys

    sys.path.insert(0, "/root/repo")
    from tools.convert_torch_ckpt import map_hf_wav2vec2_state

    flat = map_hf_wav2vec2_state(hf.state_dict(), num_heads=4)
    params = {"params": unflatten_dict({tuple(k.split("/")): jnp.asarray(v) for k, v in flat.items()})}
    return hf, jmodel, params


def test_hidden_states_match(models):
    hf, jmodel, params = models
    rng = np.random.default_rng(0)
    wav = rng.standard_normal((2, 8000)).astype(np.float32) * 0.1

    with torch.no_grad():
        ref = hf(torch.from_numpy(wav)).last_hidden_state.numpy()

    got, mask = jmodel.apply(
        params, jnp.asarray(wav), jnp.array([8000, 8000]), return_hidden=True
    )
    got = np.asarray(got)
    assert got.shape == ref.shape, (got.shape, ref.shape)
    # fp32 conv/matmul reduction-order differences (oneDNN vs XLA) bound ~3e-4
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-3)


def test_param_tree_complete(models):
    """Every parameter of the JAX model must be covered by the conversion
    (no silently random-initialized leaves)."""
    import jax
    from flax.traverse_util import flatten_dict

    hf, jmodel, params = models
    shapes = jax.eval_shape(
        jmodel.init,
        jax.random.PRNGKey(0),
        jnp.zeros((1, 4000), jnp.float32),
        jnp.zeros((1,), jnp.int32),
    )
    expected = set(flatten_dict(shapes["params"]).keys())
    got = set(flatten_dict(params["params"]).keys())
    assert expected == got, (expected - got, got - expected)
