"""Torch-checkpoint -> flax-params converters for the official pretrained
weights (role of the download/rename shims in reference
`gluefactory_nonfree/superpoint.py:337`, `models/matchers/lightglue.py:365-391`).

Zero-egress environment: weights can't be downloaded here, but any local copy
of the official files converts with:

    python -m gluefactory_tpu.compat.torch_conversion superpoint \
        superpoint_v1.pth superpoint_v1.msgpack

Conventions:
  - torch Linear weight (out, in) -> flax Dense kernel (in, out) [transpose];
  - torch Conv2d weight (O, I, H, W) -> flax Conv kernel (H, W, I, O);
  - LightGlue's fused Wqkv packs channels as (head, dim, qkv-interleaved);
    our layout is three contiguous blocks [q; k; v] each (head, dim) — the
    converter permutes rows accordingly.
"""

from __future__ import annotations

import numpy as np


def _t(w) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(w).T)


def _conv(w) -> np.ndarray:  # OIHW -> HWIO
    return np.ascontiguousarray(np.asarray(w).transpose(2, 3, 1, 0))


def load_torch_state_dict(path: str) -> dict:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "model" in sd and isinstance(sd["model"], dict):
        sd = sd["model"]
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in sd.items()}


def strip_prefixes(sd: dict, prefixes=("matcher.", "model.", "module.")) -> dict:
    out = {}
    for k, v in sd.items():
        for p in prefixes:
            if k.startswith(p):
                k = k[len(p):]
        out[k] = v
    return out


# ---------------------------------------------------------------------------
# SuperPoint (official MagicLeap superpoint_v1.pth)
# ---------------------------------------------------------------------------


def convert_superpoint(sd: dict) -> dict:
    """Official layout: conv{1..4}{a,b}, convPa/convPb, convDa/convDb — the
    same names our flax SuperPoint uses (each a VGGBlock holding Conv_0)."""
    sd = strip_prefixes(sd)
    params = {}
    names = [f"conv{i}{ab}" for i in range(1, 5) for ab in "ab"] + [
        "convPa", "convPb", "convDa", "convDb",
    ]
    for name in names:
        params[name] = {
            "Conv_0": {
                "kernel": _conv(sd[f"{name}.weight"]),
                "bias": np.asarray(sd[f"{name}.bias"]),
            }
        }
    return params


# ---------------------------------------------------------------------------
# LightGlue (official release, e.g. superpoint_lightglue.pth)
# ---------------------------------------------------------------------------


def _qkv_permutation(dim: int, num_heads: int) -> np.ndarray:
    """Row permutation torch-fused-Wqkv -> [q; k; v] blocks.

    Torch row r = h*(Dh*3) + dh*3 + j  (official `qkv.unflatten(-1, (H, -1, 3))`);
    ours row     = j*D + h*Dh + dh.
    Returns perm such that new[i] = old[perm[i]].
    """
    Dh = dim // num_heads
    perm = np.zeros(3 * dim, dtype=np.int64)
    for j in range(3):
        for h in range(num_heads):
            for dh in range(Dh):
                new = j * dim + h * Dh + dh
                old = h * Dh * 3 + dh * 3 + j
                perm[new] = old
    return perm


def convert_lightglue(sd: dict, n_layers: int = 9, dim: int = 256, num_heads: int = 4) -> dict:
    sd = strip_prefixes(sd)
    params: dict = {}
    perm = _qkv_permutation(dim, num_heads)

    if "input_proj.weight" in sd:
        params["input_proj"] = {
            "kernel": _t(sd["input_proj.weight"]),
            "bias": np.asarray(sd["input_proj.bias"]),
        }
    else:  # nn.Identity in the official model when input_dim == descriptor_dim
        params["input_proj"] = {
            "kernel": np.eye(dim, dtype=np.float32),
            "bias": np.zeros(dim, dtype=np.float32),
        }
    params["posenc"] = {"Wr": {"kernel": _t(sd["posenc.Wr.weight"])}}

    def ffn(prefix):
        return {
            "fc1": {"kernel": _t(sd[f"{prefix}.0.weight"]), "bias": np.asarray(sd[f"{prefix}.0.bias"])},
            "norm": {"scale": np.asarray(sd[f"{prefix}.1.weight"]), "bias": np.asarray(sd[f"{prefix}.1.bias"])},
            "fc2": {"kernel": _t(sd[f"{prefix}.3.weight"]), "bias": np.asarray(sd[f"{prefix}.3.bias"])},
        }

    for i in range(n_layers):
        t = f"transformers.{i}"
        wqkv = np.asarray(sd[f"{t}.self_attn.Wqkv.weight"])[perm]
        bqkv = np.asarray(sd[f"{t}.self_attn.Wqkv.bias"])[perm]
        params[f"transformers_{i}"] = {
            "self_attn": {
                "Wqkv": {"kernel": _t(wqkv), "bias": bqkv},
                "out_proj": {
                    "kernel": _t(sd[f"{t}.self_attn.out_proj.weight"]),
                    "bias": np.asarray(sd[f"{t}.self_attn.out_proj.bias"]),
                },
                "ffn": ffn(f"{t}.self_attn.ffn"),
            },
            "cross_attn": {
                "to_qk": {
                    "kernel": _t(sd[f"{t}.cross_attn.to_qk.weight"]),
                    "bias": np.asarray(sd[f"{t}.cross_attn.to_qk.bias"]),
                },
                "to_v": {
                    "kernel": _t(sd[f"{t}.cross_attn.to_v.weight"]),
                    "bias": np.asarray(sd[f"{t}.cross_attn.to_v.bias"]),
                },
                "out_proj": {
                    "kernel": _t(sd[f"{t}.cross_attn.to_out.weight"]),
                    "bias": np.asarray(sd[f"{t}.cross_attn.to_out.bias"]),
                },
                "ffn": ffn(f"{t}.cross_attn.ffn"),
            },
        }
    for i in range(n_layers):
        params[f"log_assignment_{i}"] = {
            "final_proj": {
                "kernel": _t(sd[f"log_assignment.{i}.final_proj.weight"]),
                "bias": np.asarray(sd[f"log_assignment.{i}.final_proj.bias"]),
            },
            "matchability": {
                "kernel": _t(sd[f"log_assignment.{i}.matchability.weight"]),
                "bias": np.asarray(sd[f"log_assignment.{i}.matchability.bias"]),
            },
        }
    for i in range(n_layers - 1):
        params[f"token_confidence_{i}"] = {
            "token": {
                "kernel": _t(sd[f"token_confidence.{i}.token.0.weight"]),
                "bias": np.asarray(sd[f"token_confidence.{i}.token.0.bias"]),
            }
        }
    return params


CONVERTERS = {
    "superpoint": convert_superpoint,
    "lightglue": convert_lightglue,
}


def save_params(params: dict, out_path: str, batch_stats: dict | None = None):
    from flax import serialization

    payload = {"params": params, "batch_stats": batch_stats or {}}
    with open(out_path, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))


def main():
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("model", choices=sorted(CONVERTERS))
    parser.add_argument("torch_path")
    parser.add_argument("out_path")
    args = parser.parse_args()
    sd = load_torch_state_dict(args.torch_path)
    params = CONVERTERS[args.model](sd)
    save_params(params, args.out_path)
    print(f"wrote {args.out_path}")


if __name__ == "__main__":
    main()
