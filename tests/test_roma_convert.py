"""RoMa official-weight converter: structure round-trip (fabricated
romatch-layout torch state dict + separate DINOv2 checkpoint -> our params)
against the native `roma_net.RoMaNet` tree.

romatch is not installable here, so the layout is reconstructed from the
public romatch sources (see `convert_roma` docstring for per-field
confidence); this pins the converter against the documented layout — the
LoFTR/DISK converter standard.
"""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

TINY_NET_CONF = {
    "dinov2": {
        "weights": "dinov2_vits14",
        "trainable": False,
        "embed_dim": 32,
        "depth": 1,
        "num_heads": 2,
    },
    "vgg_blocks": [[8, 2], [16, 2], [16, 2], [16, 2]],
    "gp_dim": 16,
    "decoder_blocks": 1,
    "decoder_heads": 2,
    "anchor_res": 4,
    "proj_dims": {"16": 16, "8": 16, "4": 16, "2": 8, "1": 9},
    "disp_emb_dims": {"16": 8, "8": 8, "4": 4, "2": 4, "1": 2},
    "corr_radius": {"16": 2, "8": 1, "4": 1, "2": None, "1": None},
    "hidden_blocks": 2,
}

# channel plumbing of the tiny conf (mirrors RoMaNet's wiring)
VGG_CONVS = [(0, 3, 8), (7, 10, 16), (14, 17, 16), (27, 30, 16)]  # idx, idx, ch
DEC_DIM = 32  # gp_dim + proj16
REFINER_HIDDEN = {"16": 65, "8": 49, "4": 45, "2": 20, "1": 20}
PROJ_IN = {"16": 32, "8": 16, "4": 16, "2": 16, "1": 8}


def _fake_roma_sd(rng):
    """romatch RegressionMatcher layout (encoder.cnn VGG19-BN features +
    decoder.{gps,proj,conv_refiner,embedding_decoder}); DINOv2 is NOT
    embedded (romatch hides it from state_dict)."""
    sd = {}

    def t(key, *shape):
        sd[key] = rng.normal(0, 0.05, shape).astype(np.float32)

    def bn(prefix, c):
        t(f"{prefix}.weight", c)
        t(f"{prefix}.bias", c)
        t(f"{prefix}.running_mean", c)
        sd[f"{prefix}.running_var"] = rng.uniform(0.5, 1.5, (c,)).astype(
            np.float32
        )
        sd[f"{prefix}.num_batches_tracked"] = np.asarray(7)

    c_prev = 3
    for i1, i2, c in VGG_CONVS:
        for i in (i1, i2):
            t(f"encoder.cnn.layers.{i}.weight", c, c_prev, 3, 3)
            t(f"encoder.cnn.layers.{i}.bias", c)
            bn(f"encoder.cnn.layers.{i + 1}", c)
            c_prev = c

    t("decoder.gps.16.pos_conv.weight", 16, 2, 1, 1)
    t("decoder.gps.16.pos_conv.bias", 16)

    conf = TINY_NET_CONF
    for s in ("16", "8", "4", "2", "1"):
        po = conf["proj_dims"][s]
        t(f"decoder.proj.{s}.0.weight", po, PROJ_IN[s], 1, 1)
        t(f"decoder.proj.{s}.0.bias", po)
        bn(f"decoder.proj.{s}.1", po)

        hid = REFINER_HIDDEN[s]

        def refine_block(prefix, c):
            t(f"{prefix}.0.weight", c, 1, 5, 5)  # depthwise (groups=c)
            t(f"{prefix}.0.bias", c)
            bn(f"{prefix}.1", c)
            t(f"{prefix}.3.weight", c, c, 1, 1)
            t(f"{prefix}.3.bias", c)

        r = f"decoder.conv_refiner.{s}"
        refine_block(f"{r}.block1", hid)
        for j in range(conf["hidden_blocks"]):
            refine_block(f"{r}.hidden_blocks.{j}", hid)
        t(f"{r}.out_conv.weight", 3, hid, 1, 1)
        t(f"{r}.out_conv.bias", 3)
        t(f"{r}.disp_emb.weight", conf["disp_emb_dims"][s], 2, 1, 1)
        t(f"{r}.disp_emb.bias", conf["disp_emb_dims"][s])

    D = DEC_DIM
    b = "decoder.embedding_decoder.blocks.0"
    t(f"{b}.norm1.weight", D)
    t(f"{b}.norm1.bias", D)
    t(f"{b}.attn.qkv.weight", 3 * D, D)
    t(f"{b}.attn.qkv.bias", 3 * D)
    t(f"{b}.attn.proj.weight", D, D)
    t(f"{b}.attn.proj.bias", D)
    t(f"{b}.norm2.weight", D)
    t(f"{b}.norm2.bias", D)
    t(f"{b}.mlp.fc1.weight", 4 * D, D)
    t(f"{b}.mlp.fc1.bias", 4 * D)
    t(f"{b}.mlp.fc2.weight", D, 4 * D)
    t(f"{b}.mlp.fc2.bias", D)
    k2 = conf["anchor_res"] ** 2
    t("decoder.embedding_decoder.to_out.weight", k2 + 1, D)
    t("decoder.embedding_decoder.to_out.bias", k2 + 1)
    return sd


def _fake_dinov2_sd(rng):
    """Official dinov2 torch-hub layout at the tiny dims (embed 32, depth 1,
    heads 2), as accepted by `convert_dinov2`."""
    sd = {}

    def t(key, *shape):
        sd[key] = rng.normal(0, 0.05, shape).astype(np.float32)

    D = 32
    t("cls_token", 1, 1, D)
    t("pos_embed", 1, 1370, D)
    t("patch_embed.proj.weight", D, 3, 14, 14)
    t("patch_embed.proj.bias", D)
    b = "blocks.0"
    t(f"{b}.norm1.weight", D)
    t(f"{b}.norm1.bias", D)
    t(f"{b}.attn.qkv.weight", 3 * D, D)
    t(f"{b}.attn.qkv.bias", 3 * D)
    t(f"{b}.attn.proj.weight", D, D)
    t(f"{b}.attn.proj.bias", D)
    t(f"{b}.ls1.gamma", D)
    t(f"{b}.norm2.weight", D)
    t(f"{b}.norm2.bias", D)
    t(f"{b}.mlp.fc1.weight", 4 * D, D)
    t(f"{b}.mlp.fc1.bias", 4 * D)
    t(f"{b}.mlp.fc2.weight", D, 4 * D)
    t(f"{b}.mlp.fc2.bias", D)
    t(f"{b}.ls2.gamma", D)
    t("norm.weight", D)
    t("norm.bias", D)
    return sd


@pytest.mark.slow
def test_roma_converter_roundtrip():
    from gluefactory_tpu.compat.torch_conversion import (
        convert_roma,
        roma_fold_attention_heads,
    )
    from gluefactory_tpu.models.matchers.roma_net import RoMaNet

    rng = np.random.default_rng(0)
    params, stats = convert_roma(_fake_roma_sd(rng), dinov2_sd=_fake_dinov2_sd(rng))
    params = roma_fold_attention_heads(params, num_heads=2)

    net = RoMaNet.from_conf(TINY_NET_CONF)
    im = jnp.zeros((1, 64, 64, 3), jnp.float32)
    ref = net.init({"params": jax.random.key(0)}, im, im)

    def shapes(t):
        return jax.tree.map(lambda x: jnp.asarray(x).shape, t)

    assert shapes(ref["params"]) == shapes(params["net"])
    assert shapes(ref["batch_stats"]) == shapes(stats["net"])

    # converted weights run: full coarse pass at tiny size, finite outputs
    out = net.apply(
        {"params": params["net"], "batch_stats": stats["net"]},
        jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)), jnp.float32),
        jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)), jnp.float32),
    )
    flow = np.asarray(out[1]["flow"])
    assert flow.shape == (2, 64, 64, 2)
    assert np.isfinite(flow).all()
    assert np.isfinite(np.asarray(out[1]["certainty"])).all()


def test_roma_converter_rejects_missing_dinov2():
    from gluefactory_tpu.compat.torch_conversion import convert_roma

    rng = np.random.default_rng(1)
    try:
        convert_roma(_fake_roma_sd(rng), dinov2_sd=None)
    except KeyError as e:
        assert "dinov2" in str(e).lower()
    else:
        raise AssertionError("expected KeyError for missing DINOv2 weights")
