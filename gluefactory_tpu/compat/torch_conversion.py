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


# ---------------------------------------------------------------------------
# SuperGlue (official MagicLeap superglue_{indoor,outdoor}.pth)
# ---------------------------------------------------------------------------


def _c1(w) -> np.ndarray:
    """torch Conv1d weight (O, I, 1) -> Dense kernel (I, O)."""
    return np.ascontiguousarray(np.asarray(w)[..., 0].T)


def _head_permutation(dim: int, num_heads: int) -> np.ndarray:
    """Official MultiHeadedAttention packs channels head-fastest
    (c = dh*H + h, `view(b, dim, h, n)`); ours is head-major (c = h*Dh + dh).
    Returns perm with new[i] = old[perm[i]]."""
    Dh = dim // num_heads
    perm = np.zeros(dim, dtype=np.int64)
    for h in range(num_heads):
        for dh in range(Dh):
            perm[h * Dh + dh] = dh * num_heads + h
    return perm


def _mlp_params(sd, prefix, idxs=(0, 3)):
    """Official MLP Sequential(Conv1d, BN, ReLU, ..., Conv1d) -> our MLP
    (dense_i + bn_i). Returns (params, batch_stats)."""
    params, stats = {}, {}
    conv_ids = [i for i in idxs]
    for j, ci in enumerate(conv_ids):
        params[f"dense_{j}"] = {
            "kernel": _c1(sd[f"{prefix}.{ci}.weight"]),
            "bias": np.asarray(sd[f"{prefix}.{ci}.bias"]),
        }
        bn_key = f"{prefix}.{ci + 1}.weight"
        if bn_key in sd:  # BN follows all but the last conv
            params[f"bn_{j}"] = {
                "scale": np.asarray(sd[f"{prefix}.{ci + 1}.weight"]),
                "bias": np.asarray(sd[f"{prefix}.{ci + 1}.bias"]),
            }
            stats[f"bn_{j}"] = {
                "mean": np.asarray(sd[f"{prefix}.{ci + 1}.running_mean"]),
                "var": np.asarray(sd[f"{prefix}.{ci + 1}.running_var"]),
            }
    return params, stats


def _attn_prop_params(sd, prefix, dim, num_heads):
    """AttentionalPropagation: attn.proj.{0,1,2} (q,k,v), attn.merge,
    mlp Sequential(Conv 2d->2d, BN, ReLU, Conv 2d->d)."""
    perm = _head_permutation(dim, num_heads)
    params, stats = {}, {}
    for name, j in (("proj_q", 0), ("proj_k", 1), ("proj_v", 2)):
        w = np.asarray(sd[f"{prefix}.attn.proj.{j}.weight"])[..., 0]  # (O, I)
        b = np.asarray(sd[f"{prefix}.attn.proj.{j}.bias"])
        params[name] = {"kernel": np.ascontiguousarray(w[perm].T), "bias": b[perm]}
    wm = np.asarray(sd[f"{prefix}.attn.merge.weight"])[..., 0]  # (O, I)
    params["merge"] = {
        "kernel": np.ascontiguousarray(wm[:, perm].T),
        "bias": np.asarray(sd[f"{prefix}.attn.merge.bias"]),
    }
    mlp_params, mlp_stats = _mlp_params(sd, f"{prefix}.mlp", idxs=(0, 3))
    params["mlp"] = mlp_params
    if mlp_stats:
        stats["mlp"] = mlp_stats
    return params, stats


def convert_superglue(sd: dict, n_layers: int = 9, dim: int = 256, num_heads: int = 4):
    """Returns (params, batch_stats)."""
    sd = strip_prefixes(sd)
    params: dict = {}
    stats: dict = {}
    # keypoint encoder MLP [3, 32, 64, 128, 256, 256]: convs at 0,3,6,9,12
    kenc_params, kenc_stats = _mlp_params(sd, "kenc.encoder", idxs=(0, 3, 6, 9, 12))
    params["kenc"] = kenc_params
    if kenc_stats:
        stats["kenc"] = kenc_stats
    for i in range(2 * n_layers):
        p, s = _attn_prop_params(sd, f"gnn.layers.{i}", dim, num_heads)
        params[f"gnn_{i}"] = p
        if s:
            stats[f"gnn_{i}"] = s
    params["final_proj"] = {
        "kernel": _c1(sd["final_proj.weight"]),
        "bias": np.asarray(sd["final_proj.bias"]),
    }
    params["bin_score"] = np.asarray(sd["bin_score"]).reshape(())
    return params, stats


def convert_gluestick(sd: dict, n_layers: int = 9, dim: int = 256, num_heads: int = 4):
    """Official GlueStick checkpoint (`checkpoint_GlueStick_MD.tar`, model
    state under 'model' with 'matcher.' prefixes) -> (params, batch_stats)."""
    sd = strip_prefixes(sd)
    params: dict = {}
    stats: dict = {}
    kenc_params, kenc_stats = _mlp_params(sd, "kenc.encoder", idxs=(0, 3, 6, 9, 12))
    params["kenc"] = kenc_params
    if kenc_stats:
        stats["kenc"] = kenc_stats
    lenc_params, lenc_stats = _mlp_params(sd, "lenc.encoder", idxs=(0, 3, 6, 9, 12))
    params["lenc"] = {"encoder": lenc_params}
    if lenc_stats:
        stats["lenc"] = {"encoder": lenc_stats}
    for i in range(2 * n_layers):
        p, s = _attn_prop_params(sd, f"gnn.layers.{i}.update", dim, num_heads)
        params[f"gnn_{i}"] = p
        if s:
            stats[f"gnn_{i}"] = s
    for i in range(n_layers):
        mlp_p, mlp_s = _mlp_params(sd, f"gnn.line_layers.{i}.mlp", idxs=(0, 3))
        params[f"line_layer_{i}"] = {"mlp": mlp_p}
        if mlp_s:
            stats[f"line_layer_{i}"] = {"mlp": mlp_s}
    for name in ("final_proj", "final_line_proj"):
        params[name] = {
            "kernel": _c1(sd[f"{name}.weight"]),
            "bias": np.asarray(sd[f"{name}.bias"]),
        }
    if "input_proj.weight" in sd:
        params["input_proj"] = {
            "kernel": _c1(sd["input_proj.weight"]),
            "bias": np.asarray(sd["input_proj.bias"]),
        }
    params["bin_score"] = np.asarray(sd["bin_score"]).reshape(())
    params["line_bin_score"] = np.asarray(sd["line_bin_score"]).reshape(())
    return params, stats


def convert_loftr(sd: dict, coarse_layers: int = 4, fine_layers: int = 1):
    """Official LoFTR checkpoints (outdoor_ds.ckpt / indoor_ds.ckpt,
    `state_dict` under "state_dict" with "matcher." prefixes in some
    releases) -> our `models/matchers/loftr.py` layout. PENDING validation
    against real weights (not downloadable in this environment) — the
    name mapping follows the official module tree."""
    sd = strip_prefixes(sd, ("matcher.", "model.", "module."))
    params: dict = {}
    stats: dict = {}
    bb: dict = {}
    bb_stats: dict = {}

    def bb_convbn(dst, src_conv, src_bn):
        bb[dst] = {
            "conv": {"kernel": _conv(sd[f"{src_conv}.weight"])},
            "bn": {
                "scale": np.asarray(sd[f"{src_bn}.weight"]),
                "bias": np.asarray(sd[f"{src_bn}.bias"]),
            },
        }
        bb_stats[dst] = {
            "bn": {
                "mean": np.asarray(sd[f"{src_bn}.running_mean"]),
                "var": np.asarray(sd[f"{src_bn}.running_var"]),
            }
        }

    bb_convbn("stem", "backbone.conv1", "backbone.bn1")
    for li, blocks in (("layer1", 2), ("layer2", 2), ("layer3", 2)):
        for bi in range(blocks):
            base = f"backbone.{li}.{bi}"
            dst = f"{li}_{bi}"
            sub: dict = {}
            sub_stats: dict = {}
            for cname, cn, bn_ in (("conv1", "conv1", "bn1"),
                                   ("conv2", "conv2", "bn2")):
                sub[cname] = {
                    "conv": {"kernel": _conv(sd[f"{base}.{cn}.weight"])},
                    "bn": {
                        "scale": np.asarray(sd[f"{base}.{bn_}.weight"]),
                        "bias": np.asarray(sd[f"{base}.{bn_}.bias"]),
                    },
                }
                sub_stats[cname] = {
                    "bn": {
                        "mean": np.asarray(sd[f"{base}.{bn_}.running_mean"]),
                        "var": np.asarray(sd[f"{base}.{bn_}.running_var"]),
                    }
                }
            if f"{base}.downsample.0.weight" in sd:
                sub["downsample"] = {
                    "conv": {"kernel": _conv(sd[f"{base}.downsample.0.weight"])},
                    "bn": {
                        "scale": np.asarray(sd[f"{base}.downsample.1.weight"]),
                        "bias": np.asarray(sd[f"{base}.downsample.1.bias"]),
                    },
                }
                sub_stats["downsample"] = {
                    "bn": {
                        "mean": np.asarray(
                            sd[f"{base}.downsample.1.running_mean"]),
                        "var": np.asarray(
                            sd[f"{base}.downsample.1.running_var"]),
                    }
                }
            bb[dst] = sub
            bb_stats[dst] = sub_stats
    for name in ("layer3_outconv", "layer2_outconv", "layer1_outconv"):
        bb[name] = {"kernel": _conv(sd[f"backbone.{name}.weight"])}
    for pre in ("layer2_outconv2", "layer1_outconv2"):
        bb[f"{pre}_0"] = {
            "conv": {"kernel": _conv(sd[f"backbone.{pre}.0.weight"])},
            "bn": {
                "scale": np.asarray(sd[f"backbone.{pre}.1.weight"]),
                "bias": np.asarray(sd[f"backbone.{pre}.1.bias"]),
            },
        }
        bb_stats[f"{pre}_0"] = {
            "bn": {
                "mean": np.asarray(sd[f"backbone.{pre}.1.running_mean"]),
                "var": np.asarray(sd[f"backbone.{pre}.1.running_var"]),
            }
        }
        bb[f"{pre}_1"] = {"kernel": _conv(sd[f"backbone.{pre}.3.weight"])}
    params["backbone"] = bb
    stats["backbone"] = bb_stats

    def enc_layer(dst, src):
        params[dst] = {
            "q_proj": {"kernel": _t(sd[f"{src}.q_proj.weight"])},
            "k_proj": {"kernel": _t(sd[f"{src}.k_proj.weight"])},
            "v_proj": {"kernel": _t(sd[f"{src}.v_proj.weight"])},
            "merge": {"kernel": _t(sd[f"{src}.merge.weight"])},
            "mlp_0": {"kernel": _t(sd[f"{src}.mlp.0.weight"])},
            "mlp_1": {"kernel": _t(sd[f"{src}.mlp.2.weight"])},
            "norm1": {
                "scale": np.asarray(sd[f"{src}.norm1.weight"]),
                "bias": np.asarray(sd[f"{src}.norm1.bias"]),
            },
            "norm2": {
                "scale": np.asarray(sd[f"{src}.norm2.weight"]),
                "bias": np.asarray(sd[f"{src}.norm2.bias"]),
            },
        }

    for i in range(2 * coarse_layers):
        enc_layer(f"coarse_{i}", f"loftr_coarse.layers.{i}")
    for i in range(2 * fine_layers):
        enc_layer(f"fine_{i}", f"loftr_fine.layers.{i}")
    if "fine_preprocess.down_proj.weight" in sd:
        params["down_proj"] = {
            "kernel": _t(sd["fine_preprocess.down_proj.weight"]),
            "bias": np.asarray(sd["fine_preprocess.down_proj.bias"]),
        }
        params["merge_feat"] = {
            "kernel": _t(sd["fine_preprocess.merge_feat.weight"]),
            "bias": np.asarray(sd["fine_preprocess.merge_feat.bias"]),
        }
    return params, stats


CONVERTERS = {
    "superpoint": convert_superpoint,
    "lightglue": convert_lightglue,
    "superglue": convert_superglue,
    "gluestick": convert_gluestick,
    "loftr": convert_loftr,
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
    parser.add_argument(
        "--extra",
        default=None,
        help="secondary torch checkpoint for converters that need one "
        "(roma: the official dinov2_vitl14_pretrain.pth)",
    )
    args = parser.parse_args()
    sd = load_torch_state_dict(args.torch_path)
    import inspect

    fn = CONVERTERS[args.model]
    if args.extra is not None:
        if "extra_sd" not in inspect.signature(fn).parameters:
            parser.error(f"converter {args.model!r} takes no --extra checkpoint")
        out = fn(sd, extra_sd=load_torch_state_dict(args.extra))
    else:
        out = fn(sd)
    if isinstance(out, tuple):
        params, batch_stats = out
    else:
        params, batch_stats = out, None
    save_params(params, args.out_path, batch_stats)
    print(f"wrote {args.out_path}")


if __name__ == "__main__":
    main()


def convert_aliked(sd: dict, model_name: str = "aliked-n16") -> tuple:
    """Official ALIKED checkpoint (`{model_name}.pth`, layout of reference
    `models/extractors/aliked.py:591-788`) -> (params, batch_stats) for
    `models/extractors/aliked.ALIKED` (1:1 module layout)."""
    sd = strip_prefixes(sd)
    params: dict = {}
    stats: dict = {}

    def bn(prefix):
        p = {
            "scale": np.asarray(sd[f"{prefix}.weight"]),
            "bias": np.asarray(sd[f"{prefix}.bias"]),
        }
        s = {
            "mean": np.asarray(sd[f"{prefix}.running_mean"]),
            "var": np.asarray(sd[f"{prefix}.running_var"]),
        }
        return p, s

    def plain_conv(prefix, bias=False):
        out = {"kernel": _conv(sd[f"{prefix}.weight"])}
        if bias:
            out["bias"] = np.asarray(sd[f"{prefix}.bias"])
        return out

    def dcn_conv(prefix):
        return {
            "offset_conv": plain_conv(f"{prefix}.offset_conv", bias=True),
            "kernel": _conv(sd[f"{prefix}.regular_conv.weight"]),
        }

    def block(name, dcn, residual):
        bp, bs = {}, {}
        for i in (1, 2):
            conv = f"{name}.conv{i}"
            bp[f"conv{i}"] = dcn_conv(conv) if dcn else plain_conv(conv)
            bnp, bns = bn(f"{name}.bn{i}")
            bp[f"bn{i}"] = bnp
            bs[f"bn{i}"] = bns
        if residual:
            bp["downsample"] = plain_conv(f"{name}.downsample", bias=True)
        return bp, bs

    for name, dcn, residual in (
        ("block1", False, False),
        ("block2", False, True),
        ("block3", True, True),
        ("block4", True, True),
    ):
        bp, bs = block(name, dcn, residual)
        params[name] = bp
        stats[name] = bs

    for i in (1, 2, 3, 4):
        params[f"conv{i}"] = plain_conv(f"conv{i}")
    for j, i in ((0, 1), (2, 2), (4, 3), (6, 4)):
        params[f"score_conv{i}"] = plain_conv(f"score_head.{j}")

    # SDDH: Sequential offset_conv.{0,2}; sf_conv (1x1, no bias) becomes a
    # Dense; agg_weights (M, C, C) copies straight through (einsum pcd)
    params["desc_head"] = {
        "offset_conv1": plain_conv("desc_head.offset_conv.0", bias=True),
        "offset_conv2": plain_conv("desc_head.offset_conv.2", bias=True),
        "sf_conv": {
            "kernel": np.ascontiguousarray(
                np.asarray(sd["desc_head.sf_conv.weight"])[:, :, 0, 0].T
            )
        },
        "agg_weights": np.asarray(sd["desc_head.agg_weights"]),
    }
    return params, stats


def convert_hardnet(sd: dict) -> tuple:
    """Official HardNet checkpoint (`HardNet++.pth` / kornia `hardnet`;
    canonical `features` Sequential with affine-free BatchNorms:
    convs at 0,3,6,9,12,15, the 8x8 bottleneck conv at 19, BNs right after
    each conv) -> (params, batch_stats) for
    `models/extractors/keynet_affnet_hardnet.HardNet`."""
    sd = strip_prefixes(sd)
    if any(k.startswith("features.") for k in sd):
        prefix = "features."
    else:
        prefix = ""
    params: dict = {}
    stats: dict = {}
    conv_ids = (0, 3, 6, 9, 12, 15)
    for i, ci in enumerate(conv_ids):
        params[f"conv{i}"] = {"kernel": _conv(sd[f"{prefix}{ci}.weight"])}
        stats[f"bn{i}"] = {
            "mean": np.asarray(sd[f"{prefix}{ci + 1}.running_mean"]),
            "var": np.asarray(sd[f"{prefix}{ci + 1}.running_var"]),
        }
    params["conv_final"] = {"kernel": _conv(sd[f"{prefix}19.weight"])}
    stats["bn_final"] = {
        "mean": np.asarray(sd[f"{prefix}20.running_mean"]),
        "var": np.asarray(sd[f"{prefix}20.running_var"]),
    }
    return params, stats


def convert_superpoint_open(sd: dict) -> tuple:
    """rpautrat SuperPoint (`superpoint_v6_from_tf.pth`, layout of reference
    `models/extractors/superpoint_open.py:97-121`: backbone.{blk}.{i} /
    detector.{i} / descriptor.{i} VGGBlocks each holding conv+bn) ->
    (params, batch_stats) for `extractors/superpoint.SuperPoint`
    with `variant: open`."""
    sd = strip_prefixes(sd)
    params: dict = {}
    stats: dict = {}

    def block(dst: str, src: str):
        params[dst] = {
            "Conv_0": {
                "kernel": _conv(sd[f"{src}.conv.weight"]),
                "bias": np.asarray(sd[f"{src}.conv.bias"]),
            },
            "BatchNorm_0": {
                "scale": np.asarray(sd[f"{src}.bn.weight"]),
                "bias": np.asarray(sd[f"{src}.bn.bias"]),
            },
        }
        stats[dst] = {
            "BatchNorm_0": {
                "mean": np.asarray(sd[f"{src}.bn.running_mean"]),
                "var": np.asarray(sd[f"{src}.bn.running_var"]),
            }
        }

    n_blocks = 1 + max(
        int(k.split(".")[1]) for k in sd if k.startswith("backbone.")
    )
    for i in range(n_blocks):
        block(f"conv{i+1}a", f"backbone.{i}.0")
        block(f"conv{i+1}b", f"backbone.{i}.1")
    block("convPa", "detector.0")
    block("convPb", "detector.1")
    block("convDa", "descriptor.0")
    block("convDb", "descriptor.1")
    return params, stats


def convert_dinov2(sd: dict) -> dict:
    """DINOv2 ViT weights -> `models/backbones/dinov2.DinoV2` params.

    Accepts BOTH public layouts:
      - official torch-hub release (`dinov2_vit{s,b,l,g}14[_reg]_pretrain.pth`):
        `blocks.{i}.attn.qkv.weight`, `ls1.gamma`, ...
      - HuggingFace `transformers.Dinov2Model` state dicts:
        `encoder.layer.{i}.attention.attention.{query,key,value}.weight`,
        `layer_scale1.lambda1`, ... (q/k/v are re-fused into our qkv blocks,
        which is exactly the official packing).

    Non-circular parity vs the executing `transformers.Dinov2Model` is pinned
    in `tests/test_torchref_parity.py::test_dinov2_parity_hf`.
    """
    sd = strip_prefixes(sd, ("model.", "module.", "dinov2."))
    hf = any(k.startswith("encoder.layer.") for k in sd)
    params: dict = {}

    if hf:
        emb = "embeddings."
        params["cls_token"] = np.asarray(sd[f"{emb}cls_token"])
        params["pos_embed"] = np.asarray(sd[f"{emb}position_embeddings"])
        params["patch_embed"] = {
            "kernel": _conv(sd[f"{emb}patch_embeddings.projection.weight"]),
            "bias": np.asarray(sd[f"{emb}patch_embeddings.projection.bias"]),
        }
        depth = 1 + max(
            int(k.split(".")[2]) for k in sd if k.startswith("encoder.layer.")
        )
        for i in range(depth):
            b = f"encoder.layer.{i}"
            qw = np.asarray(sd[f"{b}.attention.attention.query.weight"])
            kw = np.asarray(sd[f"{b}.attention.attention.key.weight"])
            vw = np.asarray(sd[f"{b}.attention.attention.value.weight"])
            qb = np.asarray(sd[f"{b}.attention.attention.query.bias"])
            kb = np.asarray(sd[f"{b}.attention.attention.key.bias"])
            vb = np.asarray(sd[f"{b}.attention.attention.value.bias"])
            params[f"block_{i}"] = {
                "norm1": {
                    "scale": np.asarray(sd[f"{b}.norm1.weight"]),
                    "bias": np.asarray(sd[f"{b}.norm1.bias"]),
                },
                "qkv": {
                    "kernel": _t(np.concatenate([qw, kw, vw], axis=0)),
                    "bias": np.concatenate([qb, kb, vb]),
                },
                "proj": {
                    "kernel": _t(sd[f"{b}.attention.output.dense.weight"]),
                    "bias": np.asarray(sd[f"{b}.attention.output.dense.bias"]),
                },
                "ls1": np.asarray(sd[f"{b}.layer_scale1.lambda1"]),
                "norm2": {
                    "scale": np.asarray(sd[f"{b}.norm2.weight"]),
                    "bias": np.asarray(sd[f"{b}.norm2.bias"]),
                },
                "fc1": {
                    "kernel": _t(sd[f"{b}.mlp.fc1.weight"]),
                    "bias": np.asarray(sd[f"{b}.mlp.fc1.bias"]),
                },
                "fc2": {
                    "kernel": _t(sd[f"{b}.mlp.fc2.weight"]),
                    "bias": np.asarray(sd[f"{b}.mlp.fc2.bias"]),
                },
                "ls2": np.asarray(sd[f"{b}.layer_scale2.lambda1"]),
            }
        params["norm"] = {
            "scale": np.asarray(sd["layernorm.weight"]),
            "bias": np.asarray(sd["layernorm.bias"]),
        }
        return params

    if any(".mlp.w12." in k or ".mlp.w3." in k for k in sd):
        raise ValueError(
            "this DINOv2 checkpoint uses a SwiGLU FFN (dinov2_vitg14); the "
            "implemented ViT block is the fc1/fc2 MLP of the s/b/l variants "
            "— converting it would be silently wrong"
        )
    params["cls_token"] = np.asarray(sd["cls_token"])
    params["pos_embed"] = np.asarray(sd["pos_embed"])
    if "register_tokens" in sd:
        params["register_tokens"] = np.asarray(sd["register_tokens"])
    params["patch_embed"] = {
        "kernel": _conv(sd["patch_embed.proj.weight"]),
        "bias": np.asarray(sd["patch_embed.proj.bias"]),
    }
    depth = 1 + max(int(k.split(".")[1]) for k in sd if k.startswith("blocks."))
    for i in range(depth):
        b = f"blocks.{i}"
        params[f"block_{i}"] = {
            "norm1": {
                "scale": np.asarray(sd[f"{b}.norm1.weight"]),
                "bias": np.asarray(sd[f"{b}.norm1.bias"]),
            },
            "qkv": {
                "kernel": _t(sd[f"{b}.attn.qkv.weight"]),
                "bias": np.asarray(sd[f"{b}.attn.qkv.bias"]),
            },
            "proj": {
                "kernel": _t(sd[f"{b}.attn.proj.weight"]),
                "bias": np.asarray(sd[f"{b}.attn.proj.bias"]),
            },
            "ls1": np.asarray(sd[f"{b}.ls1.gamma"]),
            "norm2": {
                "scale": np.asarray(sd[f"{b}.norm2.weight"]),
                "bias": np.asarray(sd[f"{b}.norm2.bias"]),
            },
            "fc1": {
                "kernel": _t(sd[f"{b}.mlp.fc1.weight"]),
                "bias": np.asarray(sd[f"{b}.mlp.fc1.bias"]),
            },
            "fc2": {
                "kernel": _t(sd[f"{b}.mlp.fc2.weight"]),
                "bias": np.asarray(sd[f"{b}.mlp.fc2.bias"]),
            },
            "ls2": np.asarray(sd[f"{b}.ls2.gamma"]),
        }
    params["norm"] = {
        "scale": np.asarray(sd["norm.weight"]),
        "bias": np.asarray(sd["norm.bias"]),
    }
    return params


CONVERTERS["aliked"] = convert_aliked
CONVERTERS["hardnet"] = convert_hardnet
CONVERTERS["dinov2"] = convert_dinov2
CONVERTERS["superpoint_open"] = convert_superpoint_open


# ---------------------------------------------------------------------------
# DeepLSD (official deeplsd_md.tar, `ckpt["model"]` of
# deeplsd.models.deeplsd_inference.DeepLSD — loaded by the reference at
# models/lines/deeplsd.py:30-43)
# ---------------------------------------------------------------------------


def convert_deeplsd(sd: dict) -> tuple:
    """Official DeepLSD checkpoint -> (params, batch_stats, spec) for
    `models/lines/deeplsd.DeepLSDPackageNet` (`backend: package-layout`).

    The mapping is ORDER- and SHAPE-driven rather than name-driven: torch
    state dicts preserve module-definition order, so each of the three
    sections (``backbone`` / ``df_head`` / ``angle_head``) is walked as an
    ordered sequence of conv / batch-norm submodules (a submodule = the keys
    sharing a prefix up to the last component; convs have a 4-D ``weight``,
    BNs a ``running_mean``). Backbone sub-blocks are the depth-2 prefixes in
    first-appearance order; a block whose first conv consumes more channels
    than the previous block produced is a decoder block (skip
    concatenation). The block widths found are returned as ``spec`` so the
    flax module can be instantiated to match; shape mismatches raise with
    the offending key. ConvTranspose upsampling (weight (in, out, 2, 2)) is
    detected and rejected explicitly — the package-layout net assumes
    bilinear upsampling.
    """
    sd = strip_prefixes(sd)
    sd = {k: v for k, v in sd.items() if not k.endswith("num_batches_tracked")}

    # group into torch submodules, insertion-ordered
    modules: dict = {}
    for k, v in sd.items():
        mod, leaf = k.rsplit(".", 1)
        modules.setdefault(mod, {})[leaf] = np.asarray(v)

    def classify(mod, leaves):
        if "running_mean" in leaves:
            return "bn"
        w = leaves.get("weight")
        if w is not None and w.ndim == 4:
            if w.shape[2:] == (2, 2) and w.shape[0] > w.shape[1]:
                raise ValueError(
                    f"{mod}: ConvTranspose upsampling found — the "
                    "package-layout net assumes bilinear; extend "
                    "DeepLSDPackageNet before converting this checkpoint"
                )
            return "conv"
        raise ValueError(f"unrecognized DeepLSD submodule {mod}: {sorted(leaves)}")

    sections: dict = {"backbone": [], "df_head": [], "angle_head": []}
    for mod, leaves in modules.items():
        top = mod.split(".")[0]
        if top not in sections:
            raise ValueError(f"unexpected DeepLSD top-level module: {mod}")
        sections[top].append((mod, classify(mod, leaves), leaves))

    def conv_params(leaves):
        p = {"kernel": _conv(leaves["weight"])}
        if "bias" in leaves:
            p["bias"] = np.asarray(leaves["bias"])
        return p

    def bn_split(leaves):
        return (
            {"scale": np.asarray(leaves["weight"]), "bias": np.asarray(leaves["bias"])},
            {"mean": np.asarray(leaves["running_mean"]), "var": np.asarray(leaves["running_var"])},
        )

    # ---- backbone: depth-2 prefix blocks, conv/bn pairs in order
    blocks: list = []  # [(block_name, [(conv_leaves, bn_leaves|None), ...])]
    for mod, kind, leaves in sections["backbone"]:
        blk = ".".join(mod.split(".")[:2])
        if not blocks or blocks[-1][0] != blk:
            blocks.append((blk, []))
        if kind == "conv":
            blocks[-1][1].append([leaves, None])
        else:  # bn attaches to the last conv of the block
            if not blocks[-1][1] or blocks[-1][1][-1][1] is not None:
                raise ValueError(f"BN without preceding conv in {mod}")
            blocks[-1][1][-1][1] = leaves

    enc_spec: list = []
    dec_spec: list = []
    params: dict = {}
    stats: dict = {}
    prev_out = None
    enc_outs: list = []  # encoder block output widths (skip sources)
    in_decoder = False
    for name, convs in blocks:
        first_in = convs[0][0]["weight"].shape[1]
        is_gray_input = prev_out is None
        if not is_gray_input and (in_decoder or first_in != prev_out):
            in_decoder = True
            skip_ch = (
                enc_outs[-(len(dec_spec) + 2)]
                if len(dec_spec) + 2 <= len(enc_outs)
                else None
            )
            if skip_ch is None or first_in != prev_out + skip_ch:
                raise ValueError(
                    f"{name}: first conv consumes {first_in} channels; "
                    f"expected {prev_out} + skip — unsupported topology"
                )
        widths = []
        bi = len(dec_spec) if in_decoder else len(enc_spec)
        prefix = f"dec{bi}" if in_decoder else f"enc{bi}"
        for ci, (cl, bl) in enumerate(convs):
            if bl is None:
                raise ValueError(f"{name} conv {ci}: missing BatchNorm")
            params[f"{prefix}_conv{ci}"] = conv_params(cl)
            bn_p, bn_s = bn_split(bl)
            params[f"{prefix}_bn{ci}"] = bn_p
            stats[f"{prefix}_bn{ci}"] = bn_s
            widths.append(int(cl["weight"].shape[0]))
        (dec_spec if in_decoder else enc_spec).append(tuple(widths))
        if not in_decoder:
            enc_outs.append(widths[-1])
        prev_out = widths[-1]

    # ---- heads: conv/bn pairs then a trailing 1x1 conv
    head_spec = None
    for head in ("df_head", "angle_head"):
        mods = sections[head]
        name = "df" if head == "df_head" else "angle"
        units: list = []
        for mod, kind, leaves in mods:
            if kind == "conv":
                units.append([leaves, None])
            else:
                units[-1][1] = leaves
        if not units or units[-1][0]["weight"].shape[2:] != (1, 1):
            raise ValueError(f"{head}: expected a trailing 1x1 conv")
        widths = []
        for ci, (cl, bl) in enumerate(units[:-1]):
            params[f"{name}_conv{ci}"] = conv_params(cl)
            if bl is None:
                raise ValueError(f"{head} conv {ci}: missing BatchNorm")
            bn_p, bn_s = bn_split(bl)
            params[f"{name}_bn{ci}"] = bn_p
            stats[f"{name}_bn{ci}"] = bn_s
            widths.append(int(cl["weight"].shape[0]))
        params[f"{name}_out"] = conv_params(units[-1][0])
        if head_spec is None:
            head_spec = tuple(widths)
        elif head_spec != tuple(widths):
            raise ValueError("df_head / angle_head widths differ")

    spec = {"enc": tuple(enc_spec), "dec": tuple(dec_spec), "head": head_spec}
    return params, stats, spec


def _convert_deeplsd_cli(sd: dict) -> tuple:
    params, stats, spec = convert_deeplsd(sd)
    print(f"deeplsd spec: {spec}")
    return params, stats


CONVERTERS["deeplsd"] = _convert_deeplsd_cli


def convert_disk(sd: dict) -> dict:
    """kornia DISK checkpoint (`DISK.from_pretrained("depth"/"epipolar")`,
    wrapped by reference `models/extractors/disk_kornia.py:23-24`) ->
    params for `models/extractors/disk.DISK`.

    Layout reconstructed from the PUBLIC kornia/unets sources (kornia
    vendors jatentaki/unets under `kornia/feature/disk/unet`); kornia is not
    installable here, so per-field confidence is documented instead of
    executed parity (the LoFTR/RoMa converter standard):

      - `unet.path_down.{i}` / `unet.path_up.{i}` block lists — HIGH
        (DISK's thin U-Net: down [16,32,64,64,64], up [64,64,64,129]).
      - per-block ConvBlock = Sequential(InstanceNorm2d(affine=False),
        PReLU(C_in), Conv2d 5x5) at indices 0/1/2, with the FIRST down
        block skipping the pre-activation (conv at index 0) — MEDIUM
        (unets `ThinUnetDownBlock(is_first=...)`); both index layouts are
        accepted for the first block.
      - PReLU weight broadcast: kornia may store a scalar or per-channel
        gate; both are accepted (broadcast to C_in) — HIGH.

    Keys that do not match raise, so a real checkpoint with a different
    naming fails loudly rather than loading garbage.
    """
    sd = strip_prefixes(
        sd, prefixes=("model.", "module.", "extractor.", "unet.")
    )

    def conv_block(prefix: str, first: bool = False) -> dict:
        # conv at Sequential index 2 (pre-activated) or 0 (first block)
        for ci in (2, 0) if first else (2,):
            if f"{prefix}.{ci}.weight" in sd:
                break
        else:
            raise KeyError(f"no conv weight under {prefix} (tried .2/.0)")
        out = {
            "conv": {
                "kernel": _conv(sd[f"{prefix}.{ci}.weight"]),
                "bias": _t(sd[f"{prefix}.{ci}.bias"]),
            }
        }
        if ci != 0:
            gate = _t(sd[f"{prefix}.1.weight"])  # PReLU
            c_in = out["conv"]["kernel"].shape[2]
            out["gate"] = np.broadcast_to(gate.reshape(-1), (c_in,)).copy()
        return out

    n_down = 1 + max(
        int(k.split(".")[1]) for k in sd if k.startswith("path_down.")
    )
    n_up = 1 + max(int(k.split(".")[1]) for k in sd if k.startswith("path_up."))
    unet: dict = {}
    for i in range(n_down):
        unet[f"down_{i}"] = conv_block(f"path_down.{i}.conv", first=i == 0)
    for i in range(n_up):
        unet[f"up_{i}"] = conv_block(f"path_up.{i}.conv")
    return {"unet": unet}


def convert_keynet(sd: dict) -> tuple:
    """kornia KeyNet checkpoint (`KeyNet(pretrained=True)` / the detector
    inside `KeyNetHardNet`, wrapped by reference
    `models/extractors/keynet_affnet_hardnet.py:8-74`) ->
    (params, batch_stats) for the `keynet` submodule of
    `extractors/keynet_affnet_hardnet.KeyNetAffNetHardNet`.

    Layout reconstructed from the PUBLIC kornia source
    (`kornia/feature/keynet.py`); per-field confidence:

      - learnable block = 3 x Sequential(Conv2d 5x5, BatchNorm2d, ReLU)
        under `feature_extractor.lb_block.conv{i}` — MEDIUM on the exact
        module path (alternate flat `feature_extractor.{i}` is accepted),
        HIGH on the conv/bn/relu structure.
      - `last_conv.0` = Conv2d(levels*filters -> 1, 5x5) — MEDIUM.

    The handcrafted block and the pyramid have no weights.
    """
    sd = strip_prefixes(sd, prefixes=("detector.model.", "model.", "module."))

    def find(*cands):
        for c in cands:
            if c in sd:
                return sd[c]
        raise KeyError(f"none of {cands} in state dict")

    params: dict = {"block": {}}
    stats: dict = {"block": {}}
    for i in range(3):
        w = find(
            f"feature_extractor.lb_block.conv{i}.0.weight",
            f"feature_extractor.conv{i}.0.weight",
            f"feature_extractor.{i}.0.weight",
        )
        params["block"][f"conv{i}"] = {"kernel": _conv(w)}
        bn = lambda suf, i=i: find(
            f"feature_extractor.lb_block.conv{i}.1.{suf}",
            f"feature_extractor.conv{i}.1.{suf}",
            f"feature_extractor.{i}.1.{suf}",
        )
        params["block"][f"bn{i}"] = {
            "scale": _t(bn("weight")),
            "bias": _t(bn("bias")),
        }
        stats["block"][f"bn{i}"] = {
            "mean": _t(bn("running_mean")),
            "var": _t(bn("running_var")),
        }
    params["last_conv"] = {
        "kernel": _conv(find("last_conv.0.weight", "last_conv.weight")),
        "bias": _t(find("last_conv.0.bias", "last_conv.bias")),
    }
    return params, stats


def convert_keynet_hardnet(sd: dict) -> tuple:
    """Combined kornia `KeyNetHardNet` state dict (detector.* + the
    LAFDescriptor's HardNet under descriptor.descriptor.*) -> full
    (params, batch_stats) for `extractors/keynet_affnet_hardnet.
    KeyNetAffNetHardNet` (submodules `keynet` + `hardnet`), loadable via
    `model.extractor.weights_file`. Also accepts a KeyNet-only checkpoint
    (HardNet weights then come from `convert_hardnet` separately)."""
    kn_params, kn_stats = convert_keynet(sd)
    params = {"keynet": kn_params}
    stats = {"keynet": kn_stats}
    hn_sd = {
        k.split("descriptor.descriptor.", 1)[1]: v
        for k, v in sd.items()
        if "descriptor.descriptor." in k
    }
    if hn_sd:
        hn_params, hn_stats = convert_hardnet(hn_sd)
        params["hardnet"] = hn_params
        stats["hardnet"] = hn_stats
    return params, stats


CONVERTERS["disk"] = convert_disk
CONVERTERS["keynet"] = convert_keynet
CONVERTERS["keynet_hardnet"] = convert_keynet_hardnet


def convert_roma(sd: dict, dinov2_sd: dict | None = None) -> tuple:
    """romatch `roma_{outdoor,indoor}.pth` (the RegressionMatcher state dict
    the reference wrapper downloads, `models/matchers/roma.py:190-199`) ->
    (params, batch_stats) for `matchers/roma.RoMa` (subtree `net`, the
    native `roma_net.RoMaNet`), loadable via `model.matcher.weights_file`.

    Layout reconstructed from the PUBLIC romatch sources (romatch/models/
    {model_zoo/roma_models.py, matcher.py, encoders.py, transformer/}); the
    package cannot be fetched here, so per-field confidence is documented
    instead of executed parity (the LoFTR/DISK converter standard):

      - `encoder.cnn.layers.{i}.*` — torchvision `vgg19_bn().features`
        indices (conv at i, BN at i+1, the first four blocks) — HIGH: our
        flax module names carry the same indices by construction.
      - DINOv2 is NOT in the romatch checkpoint (romatch hides it from
        state_dict via a list wrapper, encoders.py `CNNandDinov2`); pass the
        official `dinov2_vitl14_pretrain.pth` as `dinov2_sd` (CLI:
        `--extra`). Embedded `encoder.dinov2*` keys are also accepted —
        MEDIUM (exclusion mechanism verified against the public source,
        but a future romatch may inline it).
      - `decoder.gps.16.pos_conv.*` — GP Fourier positional conv — HIGH.
      - `decoder.proj.{16,8,4,2,1}.{0,1}.*` — Sequential(Conv2d 1x1,
        BatchNorm2d) per scale — HIGH.
      - `decoder.conv_refiner.{s}.block1.{0,1,3}.*` /
        `.hidden_blocks.{j}.{0,1,3}.*` — create_block =
        Sequential(depthwise conv, BN, ReLU, 1x1 conv) — MEDIUM on the
        Sequential indices (0/1/3), HIGH on the dw/pw split;
        `.out_conv.*`, `.disp_emb.*` — HIGH.
      - `decoder.embedding_decoder.blocks.{i}.*` — DINOv2-style ViT blocks
        (fused timm qkv rows [q;k;v], no LayerScale: init_values=None in
        roma_models.py) + `.to_out.*` Linear(decoder_dim -> K**2+1, the
        LAST channel the certainty logit) — MEDIUM on the certainty-channel
        position, HIGH on the block internals.

    Keys that do not match raise, so a real checkpoint with different
    naming fails loudly rather than loading garbage.
    """
    sd = strip_prefixes(sd, ("model.", "module.", "matcher."))
    sd = {k: v for k, v in sd.items() if not k.endswith("num_batches_tracked")}
    params: dict = {"vgg": {}, "decoder": {}}
    stats: dict = {"vgg": {}, "decoder": {}}

    # -- fine encoder: VGG19-BN feature indices --------------------------
    cnn = {k.split("encoder.cnn.layers.", 1)[1]: v
           for k, v in sd.items() if k.startswith("encoder.cnn.layers.")}
    if not cnn:  # older/alternate naming: encoder.cnn.{i}.*
        cnn = {k.split("encoder.cnn.", 1)[1]: v
               for k, v in sd.items() if k.startswith("encoder.cnn.")}
    conv_idxs = sorted(
        int(k.split(".")[0]) for k in cnn
        if k.endswith(".weight") and np.asarray(cnn[k]).ndim == 4
    )
    if not conv_idxs:
        raise KeyError("no VGG conv weights under encoder.cnn[.layers]")
    for i in conv_idxs:
        params["vgg"][f"conv{i}"] = {
            "kernel": _conv(cnn[f"{i}.weight"]),
            "bias": np.asarray(cnn[f"{i}.bias"]),
        }
        params["vgg"][f"bn{i}"] = {
            "scale": np.asarray(cnn[f"{i + 1}.weight"]),
            "bias": np.asarray(cnn[f"{i + 1}.bias"]),
        }
        stats["vgg"][f"bn{i}"] = {
            "mean": np.asarray(cnn[f"{i + 1}.running_mean"]),
            "var": np.asarray(cnn[f"{i + 1}.running_var"]),
        }

    # -- coarse encoder: DINOv2 (separate checkpoint or embedded) --------
    emb = {k.split(".", 2)[2]: v for k, v in sd.items()
           if k.startswith("encoder.dinov2")}
    if dinov2_sd is not None:
        params["dinov2"] = convert_dinov2(dinov2_sd)
    elif emb:
        params["dinov2"] = convert_dinov2(emb)
    else:
        raise KeyError(
            "the romatch checkpoint does not embed DINOv2 weights "
            "(romatch loads them separately); pass the official "
            "dinov2_vitl14_pretrain.pth as dinov2_sd / --extra"
        )

    dec = params["decoder"]
    dec["gp"] = {"pos_conv": {
        "kernel": _conv(sd["decoder.gps.16.pos_conv.weight"]),
        "bias": np.asarray(sd["decoder.gps.16.pos_conv.bias"]),
    }}

    for s in ("16", "8", "4", "2", "1"):
        p = f"decoder.proj.{s}"
        dec[f"proj{s}_conv"] = {
            "kernel": _conv(sd[f"{p}.0.weight"]),
            "bias": np.asarray(sd[f"{p}.0.bias"]),
        }
        dec[f"proj{s}_bn"] = {
            "scale": np.asarray(sd[f"{p}.1.weight"]),
            "bias": np.asarray(sd[f"{p}.1.bias"]),
        }
        stats["decoder"][f"proj{s}_bn"] = {
            "mean": np.asarray(sd[f"{p}.1.running_mean"]),
            "var": np.asarray(sd[f"{p}.1.running_var"]),
        }

        r = f"decoder.conv_refiner.{s}"
        ref: dict = {}
        ref_stats: dict = {}

        def block(prefix, name):
            ref[f"{name}_dw"] = {
                "kernel": _conv(sd[f"{prefix}.0.weight"]),
                "bias": np.asarray(sd[f"{prefix}.0.bias"]),
            }
            ref[f"{name}_bn"] = {
                "scale": np.asarray(sd[f"{prefix}.1.weight"]),
                "bias": np.asarray(sd[f"{prefix}.1.bias"]),
            }
            ref_stats[f"{name}_bn"] = {
                "mean": np.asarray(sd[f"{prefix}.1.running_mean"]),
                "var": np.asarray(sd[f"{prefix}.1.running_var"]),
            }
            ref[f"{name}_pw"] = {
                "kernel": _conv(sd[f"{prefix}.3.weight"]),
                "bias": np.asarray(sd[f"{prefix}.3.bias"]),
            }

        block(f"{r}.block1", "block1")
        n_hidden = 1 + max(
            int(k.split(".hidden_blocks.")[1].split(".")[0])
            for k in sd if k.startswith(f"{r}.hidden_blocks.")
        )
        for j in range(n_hidden):
            block(f"{r}.hidden_blocks.{j}", f"hidden{j}")
        ref["out_conv"] = {
            "kernel": _conv(sd[f"{r}.out_conv.weight"]),
            "bias": np.asarray(sd[f"{r}.out_conv.bias"]),
        }
        ref["disp_emb"] = {
            "kernel": _conv(sd[f"{r}.disp_emb.weight"]),
            "bias": np.asarray(sd[f"{r}.disp_emb.bias"]),
        }
        dec[f"refiner{s}"] = ref
        stats["decoder"][f"refiner{s}"] = ref_stats

    # -- anchor decoder (ViT blocks with fused timm qkv) ------------------
    ed = "decoder.embedding_decoder"
    n_blocks = 1 + max(
        int(k.split(f"{ed}.blocks.")[1].split(".")[0])
        for k in sd if k.startswith(f"{ed}.blocks.")
    )
    emdec: dict = {}
    for i in range(n_blocks):
        b = f"{ed}.blocks.{i}"
        qkv_w = np.asarray(sd[f"{b}.attn.qkv.weight"])  # (3D, D)
        qkv_b = np.asarray(sd[f"{b}.attn.qkv.bias"])
        D = qkv_w.shape[1]
        proj_w = np.asarray(sd[f"{b}.attn.proj.weight"])
        # flax MHA heads: infer from the fused dim later via reshape at load
        # time is impossible — heads comes from the module conf; emit flat
        # (D, D) kernels and let `_mha_reshape` fold them below.
        emdec[f"block{i}"] = {
            "norm1": {
                "scale": np.asarray(sd[f"{b}.norm1.weight"]),
                "bias": np.asarray(sd[f"{b}.norm1.bias"]),
            },
            "attn": {
                "query": {"kernel": _t(qkv_w[:D]), "bias": qkv_b[:D]},
                "key": {"kernel": _t(qkv_w[D:2 * D]), "bias": qkv_b[D:2 * D]},
                "value": {"kernel": _t(qkv_w[2 * D:]), "bias": qkv_b[2 * D:]},
                "out": {"kernel": _t(proj_w),
                        "bias": np.asarray(sd[f"{b}.attn.proj.bias"])},
            },
            "norm2": {
                "scale": np.asarray(sd[f"{b}.norm2.weight"]),
                "bias": np.asarray(sd[f"{b}.norm2.bias"]),
            },
            "fc1": {"kernel": _t(sd[f"{b}.mlp.fc1.weight"]),
                    "bias": np.asarray(sd[f"{b}.mlp.fc1.bias"])},
            "fc2": {"kernel": _t(sd[f"{b}.mlp.fc2.weight"]),
                    "bias": np.asarray(sd[f"{b}.mlp.fc2.bias"])},
        }
    out_w = np.asarray(sd[f"{ed}.to_out.weight"])
    if out_w.ndim == 4:  # 1x1-conv variant of to_out
        out_w = out_w[:, :, 0, 0]
    emdec["to_out"] = {
        "kernel": _t(out_w),
        "bias": np.asarray(sd[f"{ed}.to_out.bias"]),
    }
    dec["embedding_decoder"] = emdec

    return {"net": params}, {"net": stats}


def roma_fold_attention_heads(params: dict, num_heads: int) -> dict:
    """Fold the anchor decoder's flat (D, D) attention kernels emitted by
    `convert_roma` into flax MultiHeadDotProductAttention's
    (D, heads, head_dim) / (heads, head_dim, D) layout. Separate because the
    head count lives in the model conf, not the checkpoint."""
    import copy

    params = copy.deepcopy(params)
    emdec = params["net"]["decoder"]["embedding_decoder"]
    for name, blk in emdec.items():
        if not name.startswith("block"):
            continue
        attn = blk["attn"]
        D = np.asarray(attn["query"]["kernel"]).shape[0]
        hd = D // num_heads
        for k in ("query", "key", "value"):
            attn[k]["kernel"] = np.asarray(attn[k]["kernel"]).reshape(
                D, num_heads, hd
            )
            attn[k]["bias"] = np.asarray(attn[k]["bias"]).reshape(num_heads, hd)
        attn["out"]["kernel"] = np.asarray(attn["out"]["kernel"]).reshape(
            num_heads, hd, D
        )
    return params


def _convert_roma_cli(sd: dict, extra_sd: dict | None = None) -> tuple:
    params, stats = convert_roma(sd, dinov2_sd=extra_sd)
    # the shipped RoMa conf uses decoder_heads=8 (romatch roma_models.py)
    return roma_fold_attention_heads(params, num_heads=8), stats


CONVERTERS["roma"] = _convert_roma_cli
