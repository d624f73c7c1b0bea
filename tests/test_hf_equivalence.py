"""Numerical equivalence of the JAX encoder vs torch transformers.

Instantiates a small random ``transformers.Wav2Vec2Model`` (the architecture
family of SpeechLASER: feat_extract_norm="layer", do_stable_layer_norm=True),
converts its state dict with tools/convert_torch_ckpt.py's mapping, and
checks the JAX hidden states match torch's — proving that real converted
SpeechLASER/XLSR checkpoints produce correct embeddings.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # excluded from the fast parity gate

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


# ---------------------------------------------------------------------------
# w2v-BERT (SONAR's speech trunk) vs transformers.Wav2Vec2BertModel
# ---------------------------------------------------------------------------


def _w2v_bert_pair(position_embeddings_type: str):
    from transformers import Wav2Vec2BertConfig, Wav2Vec2BertModel

    from svecalign_tpu.models.w2v_bert import W2vBertConfig, W2vBertModel

    hf_cfg = Wav2Vec2BertConfig(
        hidden_size=64,
        num_hidden_layers=3,
        num_attention_heads=4,
        intermediate_size=128,
        feature_projection_input_dim=40,
        conv_depthwise_kernel_size=7,
        position_embeddings_type=position_embeddings_type,
        left_max_position_embeddings=8,
        right_max_position_embeddings=2,
        hidden_dropout=0.0,
        attention_dropout=0.0,
        feat_proj_dropout=0.0,
        activation_dropout=0.0,
        conformer_conv_dropout=0.0,
        layerdrop=0.0,
        apply_spec_augment=False,
        add_adapter=False,
    )
    torch.manual_seed(1)
    hf = Wav2Vec2BertModel(hf_cfg).eval()

    jcfg = W2vBertConfig(
        feature_projection_input_dim=40,
        hidden_size=64,
        num_hidden_layers=3,
        num_attention_heads=4,
        intermediate_size=128,
        conv_depthwise_kernel_size=7,
        position_embeddings_type=position_embeddings_type,
        left_max_position_embeddings=8,
        right_max_position_embeddings=2,
        dtype="float32",
    )
    jmodel = W2vBertModel(jcfg)

    import sys

    sys.path.insert(0, "/root/repo")
    from tools.convert_torch_ckpt import map_hf_w2v_bert_state

    flat = map_hf_w2v_bert_state(hf.state_dict())
    params = {"params": unflatten_dict(
        {tuple(k.split("/")): jnp.asarray(v) for k, v in flat.items()}
    )}
    return hf, jmodel, params


@pytest.mark.parametrize("pos_type", ["relative_key", "relative"])
def test_w2v_bert_matches_hf(pos_type):
    """The flax w2v-BERT conformer must reproduce Wav2Vec2BertModel's
    hidden states under converted weights — for both position-embedding
    flavors (relative_key = SeamlessM4T-v2/SONAR default; relative =
    Transformer-XL style) and with ragged attention masks."""
    hf, jmodel, params = _w2v_bert_pair(pos_type)
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((2, 29, 40)).astype(np.float32)
    mask = np.ones((2, 29), dtype=np.int64)
    mask[1, 21:] = 0  # ragged batch

    with torch.no_grad():
        ref = hf(
            torch.from_numpy(feats), attention_mask=torch.from_numpy(mask)
        ).last_hidden_state.numpy()

    got = np.asarray(jmodel.apply(
        params, jnp.asarray(feats), jnp.asarray(mask.astype(bool))
    ))
    assert got.shape == ref.shape
    # valid positions must agree tightly; padded positions are unspecified
    np.testing.assert_allclose(got[0], ref[0], rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(got[1, :21], ref[1, :21], rtol=1e-3, atol=1e-4)


def test_w2v_bert_param_tree_complete():
    """Conversion must cover every flax parameter exactly (no silently
    random leaves) for the default relative_key flavor."""
    import jax
    from flax.traverse_util import flatten_dict

    hf, jmodel, params = _w2v_bert_pair("relative_key")
    shapes = jax.eval_shape(
        jmodel.init, jax.random.PRNGKey(0),
        jnp.zeros((1, 8, 40), jnp.float32), jnp.ones((1, 8), bool),
    )
    expected = set(flatten_dict(shapes["params"]).keys())
    got = set(flatten_dict(params["params"]).keys())
    assert expected == got, (expected - got, got - expected)
    # and every converted shape must match the model's expectation
    exp_shapes = {k: v.shape for k, v in flatten_dict(shapes["params"]).items()}
    for k, v in flatten_dict(params["params"]).items():
        assert v.shape == exp_shapes[k], (k, v.shape, exp_shapes[k])


def test_sonar_frontend_matches_hf():
    """The fused device frontend (kaldi fbank + per-mel-bin utterance
    normalization + stride-2 stacking) must reproduce
    SeamlessM4TFeatureExtractor — SONAR's actual input pipeline."""
    import jax.numpy as jnp

    from transformers import SeamlessM4TFeatureExtractor

    from svecalign_tpu.models.sonar_encoder import sonar_frontend

    fe = SeamlessM4TFeatureExtractor()
    rng = np.random.default_rng(4)
    lens = [8000, 12345]
    wavs = [rng.standard_normal(n).astype(np.float32) * 0.1 for n in lens]

    hf = fe(wavs, sampling_rate=16000, return_tensors="np", padding="longest")
    ref_feats = hf["input_features"]  # (B, T2, 160)
    ref_mask = hf["attention_mask"]

    n_frames = 96  # static bucket > both utterances' frame counts, even
    samples = 400 + (n_frames - 1) * 160
    wav = np.zeros((2, samples), np.float32)
    lengths = np.zeros(2, np.int32)
    for i, w in enumerate(wavs):
        wav[i, : len(w)] = w
        lengths[i] = 1 + (len(w) - 400) // 160
    feats, mask = sonar_frontend(
        jnp.asarray(wav), jnp.asarray(lengths), n_frames, 80
    )
    feats, mask = np.asarray(feats), np.asarray(mask)

    for i in range(2):
        nv = int(ref_mask[i].sum())
        assert int(mask[i].sum()) == nv, (i, int(mask[i].sum()), nv)
        np.testing.assert_allclose(
            feats[i, :nv], ref_feats[i, :nv], rtol=2e-3, atol=2e-3
        )


def test_sonar_trunk_end_to_end_matches_hf():
    """Waveform -> fused frontend -> converted w2v-BERT trunk must match
    SeamlessM4TFeatureExtractor -> Wav2Vec2BertModel end to end: the
    strongest offline proof that real SONAR checkpoints reproduce."""
    import jax.numpy as jnp

    from transformers import SeamlessM4TFeatureExtractor

    from svecalign_tpu.models.sonar_encoder import sonar_frontend
    from svecalign_tpu.models.w2v_bert import W2vBertConfig, W2vBertModel

    hf, _, params = _w2v_bert_pair("relative_key")
    # rebuild jmodel at the frontend's 160-dim input
    from transformers import Wav2Vec2BertConfig, Wav2Vec2BertModel

    hf_cfg = Wav2Vec2BertConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=128, feature_projection_input_dim=160,
        conv_depthwise_kernel_size=7, hidden_dropout=0.0,
        attention_dropout=0.0, feat_proj_dropout=0.0, activation_dropout=0.0,
        conformer_conv_dropout=0.0, layerdrop=0.0, apply_spec_augment=False,
        add_adapter=False,
    )
    torch.manual_seed(2)
    hf = Wav2Vec2BertModel(hf_cfg).eval()
    jcfg = W2vBertConfig(
        feature_projection_input_dim=160, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128,
        conv_depthwise_kernel_size=7, dtype="float32",
    )
    jmodel = W2vBertModel(jcfg)
    import sys

    sys.path.insert(0, "/root/repo")
    from tools.convert_torch_ckpt import map_hf_w2v_bert_state

    params = {"params": unflatten_dict({
        tuple(k.split("/")): jnp.asarray(v)
        for k, v in map_hf_w2v_bert_state(hf.state_dict()).items()
    })}

    fe = SeamlessM4TFeatureExtractor()
    rng = np.random.default_rng(5)
    wavs = [rng.standard_normal(n).astype(np.float32) * 0.1 for n in (9000, 6200)]
    enc = fe(wavs, sampling_rate=16000, return_tensors="pt", padding="longest")
    with torch.no_grad():
        ref = hf(
            enc["input_features"], attention_mask=enc["attention_mask"]
        ).last_hidden_state.numpy()
    ref_mask = enc["attention_mask"].numpy()

    n_frames = 64
    samples = 400 + (n_frames - 1) * 160
    wav = np.zeros((2, samples), np.float32)
    lengths = np.zeros(2, np.int32)
    for i, w in enumerate(wavs):
        wav[i, : len(w)] = w
        lengths[i] = 1 + (len(w) - 400) // 160
    feats, mask = sonar_frontend(
        jnp.asarray(wav), jnp.asarray(lengths), n_frames, 80
    )
    got = np.asarray(jmodel.apply(params, feats, mask))

    for i in range(2):
        nv = int(ref_mask[i].sum())
        np.testing.assert_allclose(
            got[i, :nv], ref[i, :nv], rtol=5e-3, atol=5e-3
        )


def test_sonar_converted_ckpt_drops_in(tmp_path):
    """convert_torch_ckpt.py sonar on a bare HF Wav2Vec2BertModel must
    produce an npz that SonarSpeechModel loads directly (trunk weights
    applied, pooler random-initialized with a warning), and the loaded
    trunk must drive the same embeddings as the converted tree."""
    import sys

    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    from tools.convert_torch_ckpt import map_hf_w2v_bert_state

    from transformers import Wav2Vec2BertConfig, Wav2Vec2BertModel

    from svecalign_tpu.models.sonar_encoder import SonarEncoderConfig, SonarSpeechModel

    hf_cfg = Wav2Vec2BertConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=128, feature_projection_input_dim=160,
        conv_depthwise_kernel_size=7, apply_spec_augment=False, add_adapter=False,
    )
    torch.manual_seed(3)
    hf = Wav2Vec2BertModel(hf_cfg).eval()
    flat = map_hf_w2v_bert_state(hf.state_dict(), prefix="trunk/")
    ckpt = tmp_path / "sonar_trunk.npz"
    np.savez(ckpt, **flat)

    cfg = SonarEncoderConfig(
        n_mels=80, model_dim=64, n_layers=2, n_heads=4, ffn_dim=128,
        conv_kernel=7, pool_dim=64,
    )
    m = SonarSpeechModel(config=cfg, ckpt_path=str(ckpt))
    # the trunk leaves must be the converted tensors, not random
    got = np.asarray(
        m.params["params"]["trunk"]["fp_projection"]["kernel"]
    )
    np.testing.assert_array_equal(
        got, hf.feature_projection.projection.weight.detach().numpy().T
    )
    rng = np.random.default_rng(7)
    emb = m.encode([rng.standard_normal(16000).astype(np.float32)])
    assert emb.shape == (1, 64) and np.isfinite(emb).all()

    # wrong-architecture checkpoints must fail loudly, not silently
    bad = {k: v for k, v in flat.items()}
    bad["trunk/layers_9/final_layer_norm/scale"] = np.ones(64, np.float32)
    bad_path = tmp_path / "bad.npz"
    np.savez(bad_path, **bad)
    with pytest.raises(KeyError):
        SonarSpeechModel(config=cfg, ckpt_path=str(bad_path))


def test_fairseq_key_rename_roundtrip(models):
    """Inverse-rename the HF state dict into fairseq key names and run the
    fairseq conversion path; it must yield the identical parameter set."""
    import sys

    sys.path.insert(0, "/root/repo")
    from tools.convert_torch_ckpt import fairseq_to_hf_key, map_hf_wav2vec2_state

    hf, jmodel, params = models
    sd = hf.state_dict()

    def hf_to_fairseq(k: str) -> str:
        # the inverse of the official conversion table (layer-norm mode)
        k = k.replace("feature_projection.projection.", "post_extract_proj.")
        k = k.replace("feature_projection.layer_norm.", "layer_norm.")
        k = k.replace("encoder.pos_conv_embed.conv.", "encoder.pos_conv.0.")
        k = k.replace(".attention.", ".self_attn.")
        if k.startswith("encoder.layers.") and ".layer_norm." in k and "final" not in k:
            k = k.replace(".layer_norm.", ".self_attn_layer_norm.")
        k = k.replace(".feed_forward.intermediate_dense.", ".fc1.")
        k = k.replace(".feed_forward.output_dense.", ".fc2.")
        if k.startswith("feature_extractor.conv_layers."):
            parts = k.split(".")
            i, rest = parts[2], ".".join(parts[3:])
            if rest == "conv.weight":
                return f"feature_extractor.conv_layers.{i}.0.weight"
            if rest == "conv.bias":
                return f"feature_extractor.conv_layers.{i}.0.bias"
            if rest.startswith("layer_norm."):
                return f"feature_extractor.conv_layers.{i}.2.1.{rest.split('.')[-1]}"
        # torch parametrizations name -> classic weight-norm names
        k = k.replace("parametrizations.weight.original0", "weight_g")
        k = k.replace("parametrizations.weight.original1", "weight_v")
        return k

    fairseq_sd = {hf_to_fairseq(k): v for k, v in sd.items()}
    renamed = {fairseq_to_hf_key(k): v for k, v in fairseq_sd.items()}
    flat = map_hf_wav2vec2_state(renamed, num_heads=4)

    from flax.traverse_util import flatten_dict

    ref_flat = {"/".join(k): np.asarray(v) for k, v in flatten_dict(params["params"]).items()}
    assert set(flat) == set(ref_flat), (set(flat) ^ set(ref_flat))
    for k in flat:
        np.testing.assert_array_equal(np.asarray(flat[k]), ref_flat[k])


def test_w2v_bert_rel_key_long_sequence_matches_hf():
    """relative_key equivalence at a longer sequence (T=128 spans several
    clip windows, unlike the T=29 case above) with a ragged tail — guards
    any future relayout of the relative-position term (see the negative
    results in the module docstring: three TPU-oriented relayouts measured
    equal-or-slower than the HF einsum and were reverted)."""
    hf, jmodel, params = _w2v_bert_pair("relative_key")
    rng = np.random.default_rng(1)
    feats = rng.standard_normal((2, 128, 40)).astype(np.float32)
    mask = np.ones((2, 128), dtype=np.int64)
    mask[1, 101:] = 0

    with torch.no_grad():
        ref = hf(
            torch.from_numpy(feats), attention_mask=torch.from_numpy(mask)
        ).last_hidden_state.numpy()

    got = np.asarray(jmodel.apply(
        params, jnp.asarray(feats), jnp.asarray(mask.astype(bool))
    ))
    np.testing.assert_allclose(got[0], ref[0], rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(got[1, :101], ref[1, :101], rtol=1e-3, atol=1e-4)
