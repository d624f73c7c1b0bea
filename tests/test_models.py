"""Model-stack tests: encoder shapes/masking, VAD segmentation, embed-align
reuse parity vs the committed example."""

import numpy as np
import pytest

from svecalign_tpu.models.laser_encoder import LaserEncoderConfig, SpeechLaserModel
from svecalign_tpu.models.sonar_encoder import SonarEncoderConfig, SonarSpeechModel
from svecalign_tpu.models.vad import EnergyVAD, SileroStyleVAD, get_speech_timestamps

TINY_LASER = LaserEncoderConfig(
    conv_layers=((64, 10, 5), (64, 3, 2), (64, 2, 2)),
    encoder_dim=64,
    encoder_layers=2,
    encoder_heads=4,
    encoder_ffn_dim=128,
    conv_pos_kernel=16,
    conv_pos_groups=4,
)

TINY_SONAR = SonarEncoderConfig(
    n_mels=80, model_dim=64, n_layers=2, n_heads=4, ffn_dim=128, pool_dim=64
)


@pytest.fixture(scope="module")
def laser():
    # small max_tokens keeps padded batch rows small for CPU tests
    m = SpeechLaserModel(config=TINY_LASER, max_tokens=4 * 32000)
    m.BUCKETS = (16000, 32000)
    return m


def test_laser_encoder_shapes(laser):
    rng = np.random.default_rng(0)
    wavs = [rng.standard_normal(n).astype(np.float32) for n in (8000, 15000, 31000)]
    emb = laser.encode(wavs)
    assert emb.shape == (3, 64)
    assert np.all(np.isfinite(emb))


def test_laser_padding_invariance(laser):
    """A segment's embedding must not depend on batch padding."""
    rng = np.random.default_rng(1)
    w = rng.standard_normal(9000).astype(np.float32)
    alone = laser.encode([w])
    with_others = laser.encode([w, rng.standard_normal(15500).astype(np.float32)])
    np.testing.assert_allclose(alone[0], with_others[0], rtol=2e-2, atol=2e-3)


def test_sonar_encoder_shapes():
    m = SonarSpeechModel(config=TINY_SONAR)
    rng = np.random.default_rng(2)
    wavs = [rng.standard_normal(n).astype(np.float32) for n in (16000, 48000)]
    emb = m.encode(wavs)
    assert emb.shape == (2, 64)
    assert np.all(np.isfinite(emb))


def test_energy_vad_segments_synthetic_speech():
    """tone bursts in silence -> one segment per burst, correct extents."""
    rng = np.random.default_rng(3)
    sr = 16000
    audio = np.zeros(sr * 10, dtype=np.float32)
    audio += 1e-4 * rng.standard_normal(len(audio)).astype(np.float32)  # noise floor
    bursts = [(1.0, 2.5), (4.0, 6.0), (8.0, 9.0)]
    t = np.arange(len(audio)) / sr
    for s, e in bursts:
        seg = (t >= s) & (t < e)
        audio[seg] += 0.3 * np.sin(2 * np.pi * 220 * t[seg]).astype(np.float32)
        audio[seg] *= (1 + 0.5 * np.sin(2 * np.pi * 3 * t[seg])).astype(np.float32)

    spans = get_speech_timestamps(audio, EnergyVAD())
    assert len(spans) == 3, spans
    for (s, e), span in zip(bursts, spans):
        assert abs(span["start"] / sr - s) < 0.2, (span, s)
        assert abs(span["end"] / sr - e) < 0.2, (span, e)


def test_energy_vad_silence_gives_nothing():
    audio = np.zeros(16000 * 3, dtype=np.float32)
    assert get_speech_timestamps(audio, EnergyVAD()) == []


def test_bf16_gelu_below_rounding():
    """The bf16 tanh-GELU fast path must be indistinguishable from exact
    erf-GELU after bf16 rounding (worst-case rel error 1.8e-4 << 2^-8)."""
    import jax.numpy as jnp

    from svecalign_tpu.models.laser_encoder import _gelu

    x = np.linspace(-6, 6, 20001, dtype=np.float32)
    exact = np.asarray(_gelu(jnp.asarray(x)))  # fp32 -> erf
    fast = np.asarray(_gelu(jnp.asarray(x, jnp.bfloat16)).astype(jnp.float32))
    np.testing.assert_allclose(fast, exact, rtol=2**-6, atol=2**-7)


def test_silero_v4_vad_runs():
    vad = SileroStyleVAD()  # alias for SileroV4VAD
    rng = np.random.default_rng(4)
    audio = rng.standard_normal(16000 * 2).astype(np.float32)
    probs = vad.speech_probs(audio)
    assert probs.shape == (-(-len(audio) // vad.window_size),)
    assert np.all((probs >= 0) & (probs <= 1))


def test_silero_v4_converter_roundtrip(tmp_path):
    """Build a torchscript module with silero v4's exact module/key layout
    (STFT basis buffer, SileroVadBlock reparam convs, LSTMCell decoder,
    1x1 conv head), convert it with tools/convert_torch_ckpt.py silero,
    and check SileroV4VAD loads the .npz WITHOUT manual steps, derives the
    geometry from tensor shapes, and satisfies the output contract
    (per-chunk probabilities in [0,1] + hysteresis timestamps)."""
    torch = pytest.importorskip("torch")
    import torch.nn as tnn

    import sys

    sys.path.insert(0, "/root/repo")
    from tools.convert_torch_ckpt import convert_silero

    from svecalign_tpu.models.vad import SileroV4VAD, probs_to_timestamps

    class Block(tnn.Module):
        def __init__(self, cin, cout, k):
            super().__init__()
            self.reparam_conv = tnn.Conv1d(cin, cout, k, padding=k // 2)

        def forward(self, x):
            return torch.relu(self.reparam_conv(x))

    class Decoder(tnn.Module):
        def __init__(self, cin, h):
            super().__init__()
            self.rnn = tnn.LSTMCell(cin, h)
            self.decoder = tnn.Sequential(
                tnn.Dropout(0.0), tnn.ReLU(), tnn.Conv1d(h, 1, 1), tnn.Sigmoid()
            )

        def forward(self, x):
            return x

    class FeatureExtractor(tnn.Module):
        def __init__(self, n_fft):
            super().__init__()
            basis = torch.randn(2 * (n_fft // 2 + 1), 1, n_fft)
            self.register_buffer("forward_basis_buffer", basis)

        def forward(self, x):
            return x

    class VADRNNJIT(tnn.Module):
        def __init__(self):
            super().__init__()
            self.feature_extractor = FeatureExtractor(256)
            self.first_layer = tnn.Sequential(Block(129, 96, 3))
            self.encoder = tnn.Sequential(
                Block(96, 96, 3), Block(96, 48, 3), Block(48, 48, 3), Block(48, 96, 3)
            )
            self.decoder = Decoder(96, 48)

        def forward(self, x):
            return x

    class VADRNNJITMerge(tnn.Module):
        def __init__(self):
            super().__init__()
            self._model = VADRNNJIT()

        def forward(self, x):
            return x

    torch.manual_seed(0)
    jit = torch.jit.script(VADRNNJITMerge())
    jit_path = str(tmp_path / "silero_vad.jit")
    npz_path = str(tmp_path / "silero_v4.npz")
    torch.jit.save(jit, jit_path)
    convert_silero(jit_path, npz_path)

    vad = SileroV4VAD(ckpt_path=npz_path)
    # geometry derived from the checkpoint, not the default config
    assert vad._hidden == 48 and vad._n_lstm == 1

    sr = 16000
    t = np.arange(sr * 3) / sr
    audio = (0.2 * np.sin(2 * np.pi * 300 * t)).astype(np.float32)
    probs = vad.speech_probs(audio)
    assert probs.shape == (-(-len(audio) // vad.window_size),)
    assert np.all((probs >= 0) & (probs <= 1))
    spans = probs_to_timestamps(probs, len(audio), vad.window_size)
    for s in spans:
        assert 0 <= s["start"] < s["end"] <= len(audio)


def test_silero_v4_two_layer_lstm_names(tmp_path):
    """nn.LSTM-style weight_ih_l{j} key names must also load (the other
    published silero layout)."""
    from svecalign_tpu.models.vad import SileroV4Config, SileroV4VAD, _v4_random_weights

    cfg = SileroV4Config(lstm_layers=2, lstm_hidden=32)
    w = _v4_random_weights(cfg, seed=1)
    assert "decoder.rnn.weight_ih_l1" in w
    p = str(tmp_path / "w.npz")
    np.savez(p, **w)
    vad = SileroV4VAD(config=cfg, ckpt_path=p)
    assert vad._n_lstm == 2 and vad._hidden == 32
    rng = np.random.default_rng(5)
    probs = vad.speech_probs(rng.standard_normal(20000).astype(np.float32))
    assert np.all((probs >= 0) & (probs <= 1))


def test_vad_min_silence_merges_short_gaps():
    """a 50 ms dip below threshold must NOT split a segment (min_silence
    100 ms), exercising the hysteresis logic."""
    from svecalign_tpu.models.vad import probs_to_timestamps

    window = 1600  # 100 ms
    probs = np.array([0, 1, 1, 1, 0.1, 0.1, 1, 1, 1, 1, 0, 0, 0], dtype=np.float32)
    # 200 ms dip with min_silence=300ms -> no split
    spans = probs_to_timestamps(
        probs, len(probs) * window, window,
        threshold=0.5, min_silence_duration_ms=300, speech_pad_ms=0,
    )
    assert len(spans) == 1
    # with min_silence=100ms the dip is long enough -> split into two
    spans2 = probs_to_timestamps(
        probs, len(probs) * window, window,
        threshold=0.5, min_silence_duration_ms=100, speech_pad_ms=0,
    )
    assert len(spans2) == 2


def test_embed_align_reuse_matches_committed(example_dir):
    """The reuse pointers must reproduce the committed tsv exactly
    (reused rows point to the concat embed file with identical row ids;
    fresh rows are the same set)."""
    from svecalign_tpu.postprocess.embed_align import (
        find_reusable_embeddings,
        load_one_side_alignments,
    )

    stem = "20180313-0900-PLENARY-15"
    pair = f"{stem}_en-{stem}_de"
    aligns = load_one_side_alignments(
        example_dir / "align_0.7_clean_cat3_min1s/en-de" / f"{pair}.txt",
        example_dir / "segments/en" / f"{stem}_en.txt",
        example_dir / "segments/de" / f"{stem}_de.txt",
        embed_source=True,
    )
    reuse, miss = find_reusable_embeddings(
        aligns, example_dir / "cat_segs/en" / f"{stem}_en.txt"
    )

    committed = [
        line.split("\t")
        for line in (example_dir / "align_0.7_clean_cat3_min1s_embed/en-de" / f"{pair}.src.tsv")
        .read_text()
        .splitlines()
    ]
    assert len(committed) == len(aligns)
    for ii, (path, row) in enumerate(committed):
        if "embeds/en" in path:  # reused row
            assert reuse[ii] == int(row), ii
        else:  # freshly embedded row
            assert ii in miss, ii
    assert len(miss) == sum(1 for p, _ in committed if "embeds/en" not in p)


def test_laser_data_parallel_encode_matches_single():
    """Data-parallel inference over the 8-device mesh must match the
    single-device result (params replicated, batch sharded)."""
    import jax

    from svecalign_tpu.parallel.mesh import make_mesh

    assert len(jax.devices()) == 8
    rng = np.random.default_rng(5)
    wavs = [rng.standard_normal(n).astype(np.float32) for n in (9000, 15000, 30000, 7000)]

    single = SpeechLaserModel(config=TINY_LASER, max_tokens=8 * 32000, seed=3)
    single.BUCKETS = (16000, 32000)
    single.mesh = None
    # force the single-device path regardless of visible devices
    single.params = jax.device_put(jax.device_get(single.params))
    single._forward = jax.jit(single._dequant_apply)
    single._dp_rows = 1
    ref = single.encode(wavs)

    dp = SpeechLaserModel(
        config=TINY_LASER, max_tokens=8 * 32000, seed=3, mesh=make_mesh(model_parallel=1)
    )
    dp.BUCKETS = (16000, 32000)
    got = dp.encode(wavs)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-4)


def test_load_embed_model_memoized(monkeypatch):
    """The in-process pipeline must reuse one encoder across stages and
    languages (same args) instead of paying init+recompile 4x per run;
    different args (e.g. a per-language checkpoint) still get their own."""
    from svecalign_tpu.utils import embed_model_utils as emu

    calls = []
    monkeypatch.setattr(emu, "_build_embed_model",
                        lambda *a, **kw: calls.append(a) or object())
    emu._model_memo.clear()
    a = emu.load_embed_model("speech_laser", max_tokens=16000)
    b = emu.load_embed_model("speech_laser", max_tokens=16000)
    c = emu.load_embed_model("speech_laser", max_tokens=32000)
    assert a is b and a is not c and len(calls) == 2
    emu._model_memo.clear()
