"""Weight-converter parity tests: a numpy re-implementation of the OFFICIAL
torch layer semantics (fused Wqkv with (head, dim, qkv) channel packing,
rotary with pairwise interleaving, ffn Sequential) is compared against our
flax modules loaded with converted weights."""

import jax
import jax.numpy as jnp
import numpy as np

from gluefactory_tpu.compat.torch_conversion import (
    _qkv_permutation,
    convert_lightglue,
    convert_superpoint,
)


def make_lightglue_sd(n_layers=2, dim=64, heads=2, rng=None):
    """Random state dict in the official LightGlue checkpoint layout."""
    rng = rng or np.random.default_rng(0)
    sd = {}
    f = lambda *s: rng.normal(0, 0.5, s).astype(np.float32)
    sd["posenc.Wr.weight"] = f(dim // heads // 2, 2)
    for i in range(n_layers):
        t = f"transformers.{i}"
        sd[f"{t}.self_attn.Wqkv.weight"] = f(3 * dim, dim)
        sd[f"{t}.self_attn.Wqkv.bias"] = f(3 * dim)
        sd[f"{t}.self_attn.out_proj.weight"] = f(dim, dim)
        sd[f"{t}.self_attn.out_proj.bias"] = f(dim)
        for blk in ("self_attn", "cross_attn"):
            sd[f"{t}.{blk}.ffn.0.weight"] = f(2 * dim, 2 * dim)
            sd[f"{t}.{blk}.ffn.0.bias"] = f(2 * dim)
            sd[f"{t}.{blk}.ffn.1.weight"] = f(2 * dim)
            sd[f"{t}.{blk}.ffn.1.bias"] = f(2 * dim)
            sd[f"{t}.{blk}.ffn.3.weight"] = f(dim, 2 * dim)
            sd[f"{t}.{blk}.ffn.3.bias"] = f(dim)
        sd[f"{t}.cross_attn.to_qk.weight"] = f(dim, dim)
        sd[f"{t}.cross_attn.to_qk.bias"] = f(dim)
        sd[f"{t}.cross_attn.to_v.weight"] = f(dim, dim)
        sd[f"{t}.cross_attn.to_v.bias"] = f(dim)
        sd[f"{t}.cross_attn.to_out.weight"] = f(dim, dim)
        sd[f"{t}.cross_attn.to_out.bias"] = f(dim)
    for i in range(n_layers):
        sd[f"log_assignment.{i}.final_proj.weight"] = f(dim, dim)
        sd[f"log_assignment.{i}.final_proj.bias"] = f(dim)
        sd[f"log_assignment.{i}.matchability.weight"] = f(1, dim)
        sd[f"log_assignment.{i}.matchability.bias"] = f(1)
    for i in range(n_layers - 1):
        sd[f"token_confidence.{i}.token.0.weight"] = f(1, dim)
        sd[f"token_confidence.{i}.token.0.bias"] = f(1)
    return sd


def official_self_block_np(x, enc_cos, enc_sin, sd, prefix, dim, heads):
    """Numpy forward of the OFFICIAL SelfBlock semantics."""
    N = x.shape[0]
    Dh = dim // heads
    qkv = x @ sd[f"{prefix}.Wqkv.weight"].T + sd[f"{prefix}.Wqkv.bias"]
    qkv = qkv.reshape(N, heads, Dh, 3)  # official unflatten(-1, (H, -1, 3))
    q = qkv[..., 0].transpose(1, 0, 2)  # (H, N, Dh)
    k = qkv[..., 1].transpose(1, 0, 2)
    v = qkv[..., 2].transpose(1, 0, 2)

    def rotary(t):
        # official: cos/sin repeat_interleave(2); rotate_half on pairs
        cos2 = np.repeat(enc_cos, 2, axis=-1)
        sin2 = np.repeat(enc_sin, 2, axis=-1)
        t1 = t[..., 0::2]
        t2 = t[..., 1::2]
        rot = np.stack([-t2, t1], axis=-1).reshape(t.shape)
        return t * cos2 + rot * sin2

    q, k = rotary(q), rotary(k)
    logits = q @ k.transpose(0, 2, 1) / np.sqrt(Dh)
    a = np.exp(logits - logits.max(-1, keepdims=True))
    a /= a.sum(-1, keepdims=True)
    ctx = a @ v  # (H, N, Dh)
    msg = ctx.transpose(1, 0, 2).reshape(N, dim)
    msg = msg @ sd[f"{prefix}.out_proj.weight"].T + sd[f"{prefix}.out_proj.bias"]
    # ffn
    y = np.concatenate([x, msg], axis=-1)
    y = y @ sd[f"{prefix}.ffn.0.weight"].T + sd[f"{prefix}.ffn.0.bias"]
    mu = y.mean(-1, keepdims=True)
    var = y.var(-1, keepdims=True)
    y = (y - mu) / np.sqrt(var + 1e-5)
    y = y * sd[f"{prefix}.ffn.1.weight"] + sd[f"{prefix}.ffn.1.bias"]
    from scipy.stats import norm

    y = y * norm.cdf(y)  # exact GELU
    y = y @ sd[f"{prefix}.ffn.3.weight"].T + sd[f"{prefix}.ffn.3.bias"]
    return x + y


def test_qkv_permutation_roundtrip():
    dim, heads = 8, 2
    perm = _qkv_permutation(dim, heads)
    assert sorted(perm.tolist()) == list(range(3 * dim))


def test_self_block_parity():
    dim, heads, N = 64, 2, 12
    rng = np.random.default_rng(1)
    sd = make_lightglue_sd(n_layers=1, dim=dim, heads=heads, rng=rng)
    params = convert_lightglue(sd, n_layers=1, dim=dim, num_heads=heads)

    x = rng.normal(0, 1, (N, dim)).astype(np.float32)
    theta = rng.normal(0, 1, (N, dim // heads // 2)).astype(np.float32)
    ref = official_self_block_np(
        x, np.cos(theta), np.sin(theta), sd, "transformers.0.self_attn", dim, heads
    )

    from gluefactory_tpu.models.matchers.lightglue import SelfBlock

    blk = SelfBlock(dim, heads)
    out = blk.apply(
        {"params": params["transformers_0"]["self_attn"]},
        jnp.asarray(x[None]),
        (jnp.asarray(np.cos(theta)[None]), jnp.asarray(np.sin(theta)[None])),
    )
    np.testing.assert_allclose(np.asarray(out)[0], ref, atol=2e-4)


def test_full_lightglue_conversion_loads():
    """Converted params must exactly match the init tree structure."""
    from gluefactory_tpu.models.matchers.lightglue import LightGlue

    dim, heads, n_layers = 64, 2, 2
    sd = make_lightglue_sd(n_layers=n_layers, dim=dim, heads=heads)
    params = convert_lightglue(sd, n_layers=n_layers, dim=dim, num_heads=heads)

    lg = LightGlue.from_conf(
        {"n_layers": n_layers, "descriptor_dim": dim, "input_dim": dim,
         "num_heads": heads, "checkpointed": False}
    )
    rng = np.random.default_rng(2)
    data = {
        "keypoints0": jnp.asarray(rng.uniform(0, 256, (1, 16, 2)), jnp.float32),
        "keypoints1": jnp.asarray(rng.uniform(0, 256, (1, 16, 2)), jnp.float32),
        "descriptors0": jnp.asarray(rng.normal(size=(1, 16, dim)), jnp.float32),
        "descriptors1": jnp.asarray(rng.normal(size=(1, 16, dim)), jnp.float32),
        "view0": {"image_size": jnp.asarray([[256.0, 256.0]])},
        "view1": {"image_size": jnp.asarray([[256.0, 256.0]])},
    }
    ref_params = lg.init({"params": jax.random.key(0)}, data, method="initialize")["params"]

    def paths(tree):
        return {
            tuple(str(k) for k in p): np.asarray(v).shape
            for p, v in jax.tree_util.tree_flatten_with_path(tree)[0]
        }

    got, want = paths(params), paths(ref_params)
    assert got == want, f"missing: {set(want) - set(got)}, extra: {set(got) - set(want)}"
    # and it runs
    pred = lg.apply({"params": params}, data)
    assert np.isfinite(np.asarray(pred["log_assignment"])).all()


def test_superpoint_conversion_structure():
    from gluefactory_tpu.models.extractors.superpoint import SuperPoint

    rng = np.random.default_rng(3)
    f = lambda *s: rng.normal(0, 0.1, s).astype(np.float32)
    sd = {}
    chans = [(1, 64), (64, 64), (64, 64), (64, 64), (64, 128), (128, 128), (128, 128), (128, 128)]
    names = [f"conv{i}{ab}" for i in range(1, 5) for ab in "ab"]
    for (cin, cout), name in zip(chans, names):
        sd[f"{name}.weight"] = f(cout, cin, 3, 3)
        sd[f"{name}.bias"] = f(cout)
    sd["convPa.weight"] = f(256, 128, 3, 3)
    sd["convPa.bias"] = f(256)
    sd["convPb.weight"] = f(65, 256, 1, 1)
    sd["convPb.bias"] = f(65)
    sd["convDa.weight"] = f(256, 128, 3, 3)
    sd["convDa.bias"] = f(256)
    sd["convDb.weight"] = f(256, 256, 1, 1)
    sd["convDb.bias"] = f(256)
    params = convert_superpoint(sd)

    sp = SuperPoint.from_conf({"max_num_keypoints": 32, "detection_threshold": 0.0})
    data = {"image": jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 1)), jnp.float32)}
    ref_params = sp.init({"params": jax.random.key(0)}, data)["params"]

    def paths(tree):
        return {
            tuple(str(k) for k in p): np.asarray(v).shape
            for p, v in jax.tree_util.tree_flatten_with_path(tree)[0]
        }

    assert paths(params) == paths(ref_params)
    pred = sp.apply({"params": params}, data)
    assert pred["keypoints"].shape == (1, 32, 2)
