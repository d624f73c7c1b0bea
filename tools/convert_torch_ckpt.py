"""Convert torch checkpoints into the .npz weight format of the JAX models.

Usage:
    python tools/convert_torch_ckpt.py wav2vec2 CKPT.pt OUT.npz
    python tools/convert_torch_ckpt.py silero  silero_vad.jit OUT.npz

Maps fairseq wav2vec2 / SpeechLASER state-dict tensors onto the
LaserSpeechEncoder parameter tree (models/laser_encoder.py). Torch conv
weights are (out, in, k) -> flax (k, in, out); Linear weights transpose.
Unmatched keys are reported, not silently dropped — the architectures are
families, not byte-clones, so a given checkpoint may need mapping tweaks.
"""

import sys
from pathlib import Path

import numpy as np


def fairseq_to_hf_key(key: str) -> str:
    """Rename one fairseq wav2vec2 state key to its transformers
    (Wav2Vec2Model) equivalent — the same deterministic table HF's official
    conversion script uses. Handles both extractor norm modes."""
    k = key
    for prefix in ("w2v_encoder.w2v_model.", "w2v_model.", "model."):
        if k.startswith(prefix):
            k = k[len(prefix):]

    if k.startswith("feature_extractor.conv_layers."):
        parts = k.split(".")
        i = parts[2]
        rest = ".".join(parts[3:])
        if rest == "0.weight":
            return f"feature_extractor.conv_layers.{i}.conv.weight"
        if rest == "0.bias":
            return f"feature_extractor.conv_layers.{i}.conv.bias"
        # group mode: Sequential[2] = GroupNorm; layer mode:
        # Sequential[2] = Sequential(TransposeLast, LayerNorm, TransposeLast)
        if rest in ("2.weight", "2.bias", "2.1.weight", "2.1.bias"):
            leaf = rest.rsplit(".", 1)[1]
            return f"feature_extractor.conv_layers.{i}.layer_norm.{leaf}"
    if k.startswith("post_extract_proj."):
        return k.replace("post_extract_proj.", "feature_projection.projection.")
    if k.startswith("layer_norm."):
        return k.replace("layer_norm.", "feature_projection.layer_norm.")
    if k.startswith("encoder.pos_conv.0."):
        return k.replace("encoder.pos_conv.0.", "encoder.pos_conv_embed.conv.")
    if k.startswith("encoder.layers."):
        k = k.replace(".self_attn.", ".attention.")
        k = k.replace(".self_attn_layer_norm.", ".layer_norm.")
        k = k.replace(".fc1.", ".feed_forward.intermediate_dense.")
        k = k.replace(".fc2.", ".feed_forward.output_dense.")
        return k
    return k  # encoder.layer_norm.*, masked_spec_embed, ...


def convert_wav2vec2(ckpt_path: str, out_path: str, num_heads: int = 16) -> None:
    """Convert a fairseq wav2vec2 / SpeechLASER checkpoint: rename the keys
    to transformers form and reuse the (equivalence-tested) HF mapping."""
    import torch

    state = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    if "model" in state:
        state = state["model"]
    if "state_dict" in state:
        state = state["state_dict"]

    renamed = {fairseq_to_hf_key(k): v for k, v in state.items()}
    out = map_hf_wav2vec2_state(renamed, num_heads)
    np.savez(out_path, **out)
    print(f"wrote {len(out)} tensors to {out_path}")


def map_hf_wav2vec2_state(state: dict, num_heads: int) -> dict:
    """Map a transformers.Wav2Vec2Model state dict onto the
    LaserSpeechEncoder parameter tree. Returns {flax 'a/b/c' path: array}.

    Handles both weight-norm layouts of the positional conv
    (weight_g/weight_v and parametrizations.weight.original0/1).
    """
    sd = {k: (v.detach().cpu().float().numpy() if hasattr(v, "detach") else np.asarray(v))
          for k, v in state.items()}
    out = {}

    # positional conv: recombine weight norm (dim=2)
    for g_key, v_key in [
        ("encoder.pos_conv_embed.conv.parametrizations.weight.original0",
         "encoder.pos_conv_embed.conv.parametrizations.weight.original1"),
        ("encoder.pos_conv_embed.conv.weight_g", "encoder.pos_conv_embed.conv.weight_v"),
    ]:
        if g_key in sd:
            g, v = sd.pop(g_key), sd.pop(v_key)
            norm = np.sqrt(np.sum(v * v, axis=(0, 1), keepdims=True))
            w = g * v / np.maximum(norm, 1e-12)  # (out, in/groups, k)
            out["pos_conv/kernel"] = np.transpose(w, (2, 1, 0))
            break
    if "encoder.pos_conv_embed.conv.bias" in sd:
        out["pos_conv/bias"] = sd.pop("encoder.pos_conv_embed.conv.bias")

    unmatched = []
    _ignore = ("masked_spec_embed", "mask_emb", "quantizer.", "project_q.", "final_proj.")
    for k, arr in sd.items():
        if k.startswith(_ignore):
            continue
        if k.startswith("feature_extractor.conv_layers."):
            parts = k.split(".")
            i = parts[2]
            if parts[3] == "conv":
                if parts[4] == "weight":
                    out[f"feature_extractor/conv_{i}/kernel"] = np.transpose(arr, (2, 1, 0))
                else:
                    out[f"feature_extractor/conv_{i}/bias"] = arr
            elif parts[3] == "layer_norm":
                leaf = "scale" if parts[4] == "weight" else "bias"
                if i == "0" and f"feature_extractor/layer_norm_1/scale" not in sd:
                    # may be group norm (base flavor); name decided by config
                    out.setdefault(f"feature_extractor/layer_norm_{i}/{leaf}", arr)
                else:
                    out[f"feature_extractor/layer_norm_{i}/{leaf}"] = arr
            continue
        if k.startswith("feature_projection.layer_norm."):
            leaf = "scale" if k.endswith("weight") else "bias"
            out[f"post_extract_norm/{leaf}"] = arr
            continue
        if k == "feature_projection.projection.weight":
            out["post_extract_proj/kernel"] = arr.T
            continue
        if k == "feature_projection.projection.bias":
            out["post_extract_proj/bias"] = arr
            continue
        if k.startswith("encoder.layer_norm."):
            leaf = "scale" if k.endswith("weight") else "bias"
            out[f"encoder_norm/{leaf}"] = arr
            continue
        if k.startswith("encoder.layers."):
            parts = k.split(".")
            i = parts[2]
            rest = ".".join(parts[3:])
            base = f"layer_{i}"
            if rest == "layer_norm.weight":
                out[f"{base}/attn_norm/scale"] = arr
            elif rest == "layer_norm.bias":
                out[f"{base}/attn_norm/bias"] = arr
            elif rest == "final_layer_norm.weight":
                out[f"{base}/ffn_norm/scale"] = arr
            elif rest == "final_layer_norm.bias":
                out[f"{base}/ffn_norm/bias"] = arr
            elif rest == "feed_forward.intermediate_dense.weight":
                out[f"{base}/ffn_in/kernel"] = arr.T
            elif rest == "feed_forward.intermediate_dense.bias":
                out[f"{base}/ffn_in/bias"] = arr
            elif rest == "feed_forward.output_dense.weight":
                out[f"{base}/ffn_out/kernel"] = arr.T
            elif rest == "feed_forward.output_dense.bias":
                out[f"{base}/ffn_out/bias"] = arr
            else:
                matched = False
                for proj, name in [("q_proj", "query"), ("k_proj", "key"),
                                   ("v_proj", "value"), ("out_proj", "out")]:
                    if rest == f"attention.{proj}.weight":
                        d = arr.shape[1]
                        hd = arr.shape[0] // num_heads if name == "out" else d // num_heads
                        if name == "out":
                            out[f"{base}/attn/out/kernel"] = arr.T.reshape(
                                num_heads, arr.shape[1] // num_heads, arr.shape[0]
                            )
                        else:
                            out[f"{base}/attn/{name}/kernel"] = arr.T.reshape(
                                d, num_heads, d // num_heads
                            )
                        matched = True
                    elif rest == f"attention.{proj}.bias":
                        if name == "out":
                            out[f"{base}/attn/out/bias"] = arr
                        else:
                            out[f"{base}/attn/{name}/bias"] = arr.reshape(
                                num_heads, arr.shape[0] // num_heads
                            )
                        matched = True
                if not matched:
                    unmatched.append(k)
            continue
        unmatched.append(k)

    if unmatched:
        print(f"UNMATCHED ({len(unmatched)}):")
        for u in unmatched[:40]:
            print("  ", u)
    return out


def convert_hf_wav2vec2(ckpt_path: str, out_path: str, num_heads: int = 16) -> None:
    """Convert a transformers Wav2Vec2Model checkpoint directory/file."""
    import torch

    if Path(ckpt_path).is_dir():
        from transformers import Wav2Vec2Model

        model = Wav2Vec2Model.from_pretrained(ckpt_path)
        state = model.state_dict()
        num_heads = model.config.num_attention_heads
    else:
        state = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    out = map_hf_wav2vec2_state(state, num_heads)
    np.savez(out_path, **out)
    print(f"wrote {len(out)} tensors to {out_path}")


def map_hf_w2v_bert_state(state: dict, prefix: str = "") -> dict:
    """Map a transformers.Wav2Vec2BertModel state dict onto the
    models/w2v_bert.py W2vBertModel parameter tree. Returns
    {flax 'a/b/c' path: array}. ``prefix`` prepends a tree path (e.g.
    'trunk/') for models that embed the w2v-BERT as a submodule.

    Layout rules: torch Linear (out, in) -> flax Dense kernel (in, out);
    pointwise Conv1d (out, in, 1) -> Dense kernel (in, out); depthwise
    Conv1d (H, 1, k) -> flax Conv kernel (k, 1, H); distance/positional
    embedding tables copy as-is. Equivalence is enforced numerically in
    tests/test_hf_equivalence.py::test_w2v_bert_matches_hf.
    """
    sd = {k: (v.detach().cpu().float().numpy() if hasattr(v, "detach") else np.asarray(v))
          for k, v in state.items()}
    out = {}
    unmatched = []

    _ln = lambda k: "scale" if k.endswith("weight") else "bias"
    for k, arr in sd.items():
        if k.startswith("masked_spec_embed") or ".num_batches_tracked" in k:
            continue
        if k.startswith("feature_projection.layer_norm."):
            out[f"{prefix}fp_layer_norm/{_ln(k)}"] = arr
        elif k == "feature_projection.projection.weight":
            out[f"{prefix}fp_projection/kernel"] = arr.T
        elif k == "feature_projection.projection.bias":
            out[f"{prefix}fp_projection/bias"] = arr
        elif k.startswith("encoder.layers."):
            parts = k.split(".")
            i = parts[2]
            rest = ".".join(parts[3:])
            base = f"{prefix}layers_{i}"
            if rest.startswith(("ffn1_layer_norm.", "self_attn_layer_norm.",
                                "ffn2_layer_norm.", "final_layer_norm.")):
                mod = rest.split(".")[0]
                out[f"{base}/{mod}/{_ln(rest)}"] = arr
            elif rest.startswith(("ffn1.", "ffn2.")):
                ffn, dense, leaf = rest.split(".")
                out[f"{base}/{ffn}/{dense}/" + ("kernel" if leaf == "weight" else "bias")] = (
                    arr.T if leaf == "weight" else arr
                )
            elif rest.startswith("self_attn."):
                sub = rest[len("self_attn."):]
                if sub == "distance_embedding.weight":
                    out[f"{base}/self_attn/distance_embedding"] = arr
                elif sub in ("pos_bias_u", "pos_bias_v"):
                    out[f"{base}/self_attn/{sub}"] = arr
                elif sub == "linear_pos.weight":
                    out[f"{base}/self_attn/linear_pos/kernel"] = arr.T
                else:
                    name, leaf = sub.split(".")
                    out[f"{base}/self_attn/{name}/" + ("kernel" if leaf == "weight" else "bias")] = (
                        arr.T if leaf == "weight" else arr
                    )
            elif rest.startswith("conv_module."):
                sub = rest[len("conv_module."):]
                if sub.startswith(("layer_norm.", "depthwise_layer_norm.")):
                    mod = sub.split(".")[0]
                    out[f"{base}/conv_module/{mod}/{_ln(sub)}"] = arr
                elif sub == "pointwise_conv1.weight":
                    out[f"{base}/conv_module/pointwise_conv1/kernel"] = arr[:, :, 0].T
                elif sub == "pointwise_conv2.weight":
                    out[f"{base}/conv_module/pointwise_conv2/kernel"] = arr[:, :, 0].T
                elif sub == "depthwise_conv.weight":
                    out[f"{base}/conv_module/depthwise_conv/kernel"] = np.transpose(
                        arr, (2, 1, 0)
                    )
                else:
                    unmatched.append(k)
            else:
                unmatched.append(k)
        else:
            unmatched.append(k)

    if unmatched:
        print(f"UNMATCHED ({len(unmatched)}):")
        for u in unmatched[:40]:
            print("  ", u)
    return out


def convert_sonar(ckpt_path: str, out_path: str) -> None:
    """Convert a w2v-BERT checkpoint (transformers Wav2Vec2BertModel
    directory, or a raw torch state dict with HF key names) into the SONAR
    speech encoder's trunk weights. The SONAR pooler (learned-query
    attention pooling), if present under 'pooler.*' keys, maps too."""
    import torch

    if Path(ckpt_path).is_dir():
        from transformers import Wav2Vec2BertModel

        model = Wav2Vec2BertModel.from_pretrained(ckpt_path)
        state = model.state_dict()
    else:
        state = torch.load(ckpt_path, map_location="cpu", weights_only=False)
        if "model" in state:
            state = state["model"]
        if "state_dict" in state:
            state = state["state_dict"]

    trunk = {k: v for k, v in state.items() if not k.startswith("pooler.")}
    out = map_hf_w2v_bert_state(trunk, prefix="trunk/")
    for k, v in state.items():
        if k.startswith("pooler."):
            arr = v.detach().cpu().float().numpy()
            name = k[len("pooler."):]
            if name.endswith("weight") and arr.ndim == 2:
                out["pooler/" + name.rsplit(".", 1)[0].replace(".", "/") + "/kernel"] = arr.T
            else:
                out["pooler/" + name.replace(".", "/")] = arr
    np.savez(out_path, **out)
    print(f"wrote {len(out)} tensors to {out_path}")


def convert_silero(ckpt_path: str, out_path: str) -> None:
    """Convert the published silero-vad v4 torchscript (silero_vad.jit)
    into an .npz that models/vad.py SileroV4VAD loads WITHOUT manual
    steps: the 16 kHz branch's state dict is emitted under its original
    key names (``_model.`` prefix stripped); SileroV4VAD derives channel
    counts, kernel sizes and the LSTM layout from the tensor shapes.

    Keys expected from v4 (VADRNNJITMerge._model / VADRNNJIT):
      feature_extractor.forward_basis_buffer      (2*(nfft//2+1), 1, nfft)
      first_layer.0.reparam_conv.{weight,bias}
      encoder.{i}.reparam_conv.{weight,bias}
      decoder.rnn.weight_ih[_l{j}] / weight_hh / bias_ih / bias_hh
      decoder.decoder.2.{weight,bias}             (1x1 conv head)
    Unrecognized keys are kept verbatim (and reported) so nothing is
    silently dropped if a checkpoint revision adds tensors.
    """
    import torch

    model = torch.jit.load(ckpt_path, map_location="cpu")
    state = {k: v.detach().cpu().float().numpy()
             for k, v in model.state_dict().items()}

    # prefer the 16 kHz branch when the merged 8k/16k container is given
    if any(k.startswith("_model.") for k in state):
        state = {k[len("_model."):]: v for k, v in state.items()
                 if k.startswith("_model.")}

    known_prefixes = (
        "feature_extractor.", "first_layer.", "encoder.", "decoder.",
    )
    extra = [k for k in state if not k.startswith(known_prefixes)]
    if extra:
        print(f"NOTE: {len(extra)} unrecognized tensors kept verbatim:")
        for k in extra[:20]:
            print("  ", k)

    np.savez(out_path, **state)
    print(f"wrote {len(state)} tensors to {out_path}; load with "
          "SileroV4VAD(ckpt_path=...) / --vad_ckpt (geometry is derived "
          "from the tensor shapes).")


if __name__ == "__main__":
    kind, src, dst = sys.argv[1], sys.argv[2], sys.argv[3]
    if kind == "wav2vec2":
        convert_wav2vec2(src, dst)
    elif kind == "hf_wav2vec2":
        convert_hf_wav2vec2(src, dst)
    elif kind == "silero":
        convert_silero(src, dst)
    elif kind == "sonar":
        convert_sonar(src, dst)
    else:
        raise SystemExit(f"unknown kind {kind}")
