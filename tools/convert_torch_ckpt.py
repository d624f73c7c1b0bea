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


def convert_wav2vec2(ckpt_path: str, out_path: str) -> None:
    import torch

    state = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    if "model" in state:
        state = state["model"]
    if "state_dict" in state:
        state = state["state_dict"]

    out = {}
    unmatched = []
    for key, tensor in state.items():
        arr = tensor.detach().cpu().float().numpy()
        new = _map_wav2vec2_key(key, arr)
        if new is None:
            unmatched.append(key)
            continue
        name, val = new
        out[name] = val

    np.savez(out_path, **out)
    print(f"wrote {len(out)} tensors to {out_path}")
    if unmatched:
        print(f"UNMATCHED ({len(unmatched)}):")
        for k in unmatched[:40]:
            print("  ", k)


def _map_wav2vec2_key(key: str, arr: np.ndarray):
    """fairseq wav2vec2 -> LaserSpeechEncoder param paths."""
    k = key
    # conv feature extractor: feature_extractor.conv_layers.N.0.weight
    if "feature_extractor.conv_layers" in k:
        parts = k.split(".")
        layer = parts[parts.index("conv_layers") + 1]
        if k.endswith("0.weight"):  # conv
            return (
                f"feature_extractor/conv_{layer}/kernel",
                np.transpose(arr, (2, 1, 0)),
            )
        if "layer_norm" in k or ".2." in k:  # group norm on layer 0
            leaf = "scale" if k.endswith("weight") else "bias"
            return (f"feature_extractor/group_norm/{leaf}", arr)
        return None
    if k == "post_extract_proj.weight":
        return ("post_extract_proj/kernel", arr.T)
    if k == "post_extract_proj.bias":
        return ("post_extract_proj/bias", arr)
    if k.startswith("encoder.pos_conv"):
        if k.endswith("weight_g") or k.endswith("weight_v"):
            return None  # weight-norm pairs need recombination; handled below
        if k.endswith("weight"):
            return ("pos_conv/kernel", np.transpose(arr, (2, 1, 0)))
        if k.endswith("bias"):
            return ("pos_conv/bias", arr)
    if k == "encoder.layer_norm.weight":
        return ("encoder_norm/scale", arr)
    if k == "encoder.layer_norm.bias":
        return ("encoder_norm/bias", arr)
    if k == "layer_norm.weight":
        return ("post_extract_norm/scale", arr)
    if k == "layer_norm.bias":
        return ("post_extract_norm/bias", arr)

    if k.startswith("encoder.layers."):
        parts = k.split(".")
        i = parts[2]
        rest = ".".join(parts[3:])
        base = f"layer_{i}"
        heads = None  # flax MHA uses (embed, heads, head_dim); infer later
        mapping = {
            "self_attn_layer_norm.weight": (f"{base}/attn_norm/scale", arr),
            "self_attn_layer_norm.bias": (f"{base}/attn_norm/bias", arr),
            "final_layer_norm.weight": (f"{base}/ffn_norm/scale", arr),
            "final_layer_norm.bias": (f"{base}/ffn_norm/bias", arr),
            "fc1.weight": (f"{base}/ffn_in/kernel", arr.T),
            "fc1.bias": (f"{base}/ffn_in/bias", arr),
            "fc2.weight": (f"{base}/ffn_out/kernel", arr.T),
            "fc2.bias": (f"{base}/ffn_out/bias", arr),
        }
        if rest in mapping:
            return mapping[rest]
        for proj, name in [("q_proj", "query"), ("k_proj", "key"),
                           ("v_proj", "value"), ("out_proj", "out")]:
            if rest == f"self_attn.{proj}.weight":
                d = arr.shape[0]
                heads = 16
                hd = d // heads
                if name == "out":
                    w = arr.T.reshape(heads, hd, d).transpose(0, 1, 2)
                    return (f"{base}/attn/out/kernel", w)
                w = arr.T.reshape(d, heads, hd)
                return (f"{base}/attn/{name}/kernel", w)
            if rest == f"self_attn.{proj}.bias":
                d = arr.shape[0]
                heads = 16
                hd = d // heads
                if name == "out":
                    return (f"{base}/attn/out/bias", arr)
                return (f"{base}/attn/{name}/bias", arr.reshape(heads, hd))
    return None


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
    for k, arr in sd.items():
        if k == "masked_spec_embed":
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


def convert_silero(ckpt_path: str, out_path: str) -> None:
    import torch

    model = torch.jit.load(ckpt_path, map_location="cpu")
    out = {}
    for name, tensor in model.state_dict().items():
        out[name.replace(".", "/")] = tensor.detach().cpu().float().numpy()
    np.savez(out_path, **out)
    print(
        f"wrote {len(out)} raw tensors to {out_path}; map them onto "
        "models/vad.py SileroStyleConfig manually (architectures differ "
        "across silero versions)."
    )


if __name__ == "__main__":
    kind, src, dst = sys.argv[1], sys.argv[2], sys.argv[3]
    if kind == "wav2vec2":
        convert_wav2vec2(src, dst)
    elif kind == "hf_wav2vec2":
        convert_hf_wav2vec2(src, dst)
    elif kind == "silero":
        convert_silero(src, dst)
    else:
        raise SystemExit(f"unknown kind {kind}")
