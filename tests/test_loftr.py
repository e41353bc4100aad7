"""Native LoFTR: forward contract, identity-pair behavior, and converter
round-trip (fabricated official-layout torch state dict -> our params)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from gluefactory_tpu.models import get_model


def _model(k=64, layers=1):
    return get_model("loftr").from_conf(
        {"max_num_matches": k, "coarse_layers": layers, "fine_layers": 1}
    )


def test_loftr_forward_contract():
    rng = np.random.default_rng(0)
    model = _model()
    data = {
        "view0": {"image": jnp.asarray(rng.uniform(0, 1, (1, 64, 96, 1)), jnp.float32)},
        "view1": {"image": jnp.asarray(rng.uniform(0, 1, (1, 64, 96, 1)), jnp.float32)},
    }
    v = model.init({"params": jax.random.key(0)}, data)
    out = model.apply(v, data)
    assert out["keypoints0"].shape == (1, 64, 2)
    assert out["matches0"].shape == (1, 64)
    m = np.asarray(out["keypoint_mask0"][0])
    km = np.asarray(out["matches0"][0])
    assert ((km >= 0) == m).all()  # aligned-list contract


def test_loftr_identity_pair_matches_diagonally():
    """Same image in both views: every surviving coarse match must connect
    a cell to ITSELF, and the fine offset must stay tiny."""
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.uniform(0, 1, (1, 64, 96, 1)), jnp.float32)
    model = _model()
    data = {"view0": {"image": img}, "view1": {"image": img}}
    v = model.init({"params": jax.random.key(0)}, data)
    out = model.apply(v, data)
    m = np.asarray(out["keypoint_mask0"][0])
    if m.sum() == 0:
        return  # random weights may produce nothing above threshold
    k0 = np.asarray(out["keypoints0"][0])[m]
    k1 = np.asarray(out["keypoints1"][0])[m]
    np.testing.assert_allclose(k0, k1, atol=1.5)


def _fake_loftr_sd(rng):
    sd = {}

    def conv(name, co, ci, k):
        sd[f"{name}.weight"] = rng.normal(0, 0.05, (co, ci, k, k)).astype(np.float32)

    def bn(name, ch):
        sd[f"{name}.weight"] = np.ones(ch, np.float32)
        sd[f"{name}.bias"] = np.zeros(ch, np.float32)
        sd[f"{name}.running_mean"] = np.zeros(ch, np.float32)
        sd[f"{name}.running_var"] = np.ones(ch, np.float32)

    def lin(name, co, ci, bias=False):
        sd[f"{name}.weight"] = rng.normal(0, 0.05, (co, ci)).astype(np.float32)
        if bias:
            sd[f"{name}.bias"] = np.zeros(co, np.float32)

    conv("backbone.conv1", 128, 1, 7)
    bn("backbone.bn1", 128)
    dims = {"layer1": (128, 128), "layer2": (196, 128), "layer3": (256, 196)}
    for li, (d, dprev) in dims.items():
        for bi in (0, 1):
            cin = dprev if bi == 0 else d
            conv(f"backbone.{li}.{bi}.conv1", d, cin, 3)
            bn(f"backbone.{li}.{bi}.bn1", d)
            conv(f"backbone.{li}.{bi}.conv2", d, d, 3)
            bn(f"backbone.{li}.{bi}.bn2", d)
            if bi == 0 and d != dprev:
                conv(f"backbone.{li}.{bi}.downsample.0", d, dprev, 1)
                bn(f"backbone.{li}.{bi}.downsample.1", d)
    conv("backbone.layer3_outconv", 256, 256, 1)
    conv("backbone.layer2_outconv", 256, 196, 1)
    conv("backbone.layer2_outconv2.0", 256, 256, 3)
    bn("backbone.layer2_outconv2.1", 256)
    conv("backbone.layer2_outconv2.3", 196, 256, 3)
    conv("backbone.layer1_outconv", 196, 128, 1)
    conv("backbone.layer1_outconv2.0", 196, 196, 3)
    bn("backbone.layer1_outconv2.1", 196)
    conv("backbone.layer1_outconv2.3", 128, 196, 3)
    for i in range(8):
        p = f"loftr_coarse.layers.{i}"
        for q in ("q_proj", "k_proj", "v_proj", "merge"):
            lin(f"{p}.{q}", 256, 256)
        lin(f"{p}.mlp.0", 512, 512)
        lin(f"{p}.mlp.2", 256, 512)
        for nrm in ("norm1", "norm2"):
            sd[f"{p}.{nrm}.weight"] = np.ones(256, np.float32)
            sd[f"{p}.{nrm}.bias"] = np.zeros(256, np.float32)
    for i in range(2):
        p = f"loftr_fine.layers.{i}"
        for q in ("q_proj", "k_proj", "v_proj", "merge"):
            lin(f"{p}.{q}", 128, 128)
        lin(f"{p}.mlp.0", 256, 256)
        lin(f"{p}.mlp.2", 128, 256)
        for nrm in ("norm1", "norm2"):
            sd[f"{p}.{nrm}.weight"] = np.ones(128, np.float32)
            sd[f"{p}.{nrm}.bias"] = np.zeros(128, np.float32)
    lin("fine_preprocess.down_proj", 128, 256, bias=True)
    lin("fine_preprocess.merge_feat", 128, 256, bias=True)
    return sd


@pytest.mark.slow
def test_loftr_converter_roundtrip():
    """The converted official-layout state dict must slot exactly into our
    flax tree (same structure & shapes) and run."""
    from gluefactory_tpu.compat.torch_conversion import convert_loftr

    rng = np.random.default_rng(2)
    sd = _fake_loftr_sd(rng)
    params, stats = convert_loftr(sd)

    model = get_model("loftr").from_conf({"max_num_matches": 32})
    data = {
        "view0": {"image": jnp.zeros((1, 64, 64, 1), jnp.float32)},
        "view1": {"image": jnp.zeros((1, 64, 64, 1), jnp.float32)},
    }
    ref = model.init({"params": jax.random.key(0)}, data)

    def shapes(t):
        return jax.tree.map(lambda x: jnp.asarray(x).shape, t)

    ref_shapes = shapes(ref["params"])
    got_shapes = shapes(params)
    assert ref_shapes == got_shapes, (
        f"param tree mismatch:\n{ref_shapes}\nvs\n{got_shapes}")

    out = model.apply(
        {"params": params, "batch_stats": stats},
        {"view0": {"image": jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 1)),
                                        jnp.float32)},
         "view1": {"image": jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 1)),
                                        jnp.float32)}},
    )
    assert np.isfinite(np.asarray(out["matching_scores0"])).all()


def test_sine_pos_encoding_matches_official_formula():
    """Golden-value check against the official LoFTR PositionEncodingSine
    (torch lines: ones().cumsum() positions, div_term =
    exp(arange(0, d/2, 2) * (-log(10000) / (d/2))); channel-first layout
    pe[0::4]=sin(x), [1::4]=cos(x), [2::4]=sin(y), [3::4]=cos(y))."""
    import math

    from gluefactory_tpu.models.matchers.loftr import sine_pos_encoding

    h, w, d = 5, 7, 16
    # independent numpy transcription of the official formula
    y_pos = np.cumsum(np.ones((h, w)), axis=0)  # 1-indexed
    x_pos = np.cumsum(np.ones((h, w)), axis=1)
    div = np.exp(np.arange(0, d // 2, 2) * (-math.log(10000.0) / (d // 2)))
    pe = np.zeros((d, h, w))
    pe[0::4] = np.sin(x_pos[None] * div[:, None, None])
    pe[1::4] = np.cos(x_pos[None] * div[:, None, None])
    pe[2::4] = np.sin(y_pos[None] * div[:, None, None])
    pe[3::4] = np.cos(y_pos[None] * div[:, None, None])

    got = np.asarray(sine_pos_encoding(h, w, d))  # (H, W, d)
    np.testing.assert_allclose(got, pe.transpose(1, 2, 0), atol=1e-6)
