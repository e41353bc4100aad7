"""SuperGlue/GlueStick converter tests: synthetic state dicts in the official
torch layout, converted into our flax trees; numeric parity of the
AttentionalPropagation block (head-fastest channel packing) vs a numpy
reimplementation of the official semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from gluefactory_tpu.compat.torch_conversion import (
    _head_permutation,
    convert_superglue,
)


def make_superglue_sd(n_layers=1, dim=32, heads=2, rng=None):
    rng = rng or np.random.default_rng(0)
    f = lambda *s: rng.normal(0, 0.5, s).astype(np.float32)
    sd = {}
    # kenc: MLP [3, 32, 64, 128, 256->dim...] use channels [3,8,16,dim]
    chans = [3, 8, 16, 24, 28, dim]
    conv_ids = [0, 3, 6, 9, 12]
    for j, ci in enumerate(conv_ids):
        cin, cout = chans[j], chans[j + 1]
        sd[f"kenc.encoder.{ci}.weight"] = f(cout, cin, 1)
        sd[f"kenc.encoder.{ci}.bias"] = f(cout)
        if j < len(conv_ids) - 1:
            sd[f"kenc.encoder.{ci+1}.weight"] = f(cout)
            sd[f"kenc.encoder.{ci+1}.bias"] = f(cout)
            sd[f"kenc.encoder.{ci+1}.running_mean"] = f(cout)
            sd[f"kenc.encoder.{ci+1}.running_var"] = np.abs(f(cout)) + 0.5
    for i in range(2 * n_layers):
        p = f"gnn.layers.{i}"
        for j in range(3):
            sd[f"{p}.attn.proj.{j}.weight"] = f(dim, dim, 1)
            sd[f"{p}.attn.proj.{j}.bias"] = f(dim)
        sd[f"{p}.attn.merge.weight"] = f(dim, dim, 1)
        sd[f"{p}.attn.merge.bias"] = f(dim)
        sd[f"{p}.mlp.0.weight"] = f(2 * dim, 2 * dim, 1)
        sd[f"{p}.mlp.0.bias"] = f(2 * dim)
        sd[f"{p}.mlp.1.weight"] = f(2 * dim)
        sd[f"{p}.mlp.1.bias"] = f(2 * dim)
        sd[f"{p}.mlp.1.running_mean"] = f(2 * dim)
        sd[f"{p}.mlp.1.running_var"] = np.abs(f(2 * dim)) + 0.5
        sd[f"{p}.mlp.3.weight"] = f(dim, 2 * dim, 1)
        sd[f"{p}.mlp.3.bias"] = f(dim)
    sd["final_proj.weight"] = f(dim, dim, 1)
    sd["final_proj.bias"] = f(dim)
    sd["bin_score"] = np.asarray(1.3, np.float32)
    return sd


def official_attn_prop_np(x, source, sd, prefix, dim, heads):
    """Numpy forward of the OFFICIAL AttentionalPropagation (head-fastest
    channel packing, BN in eval mode) returning x + delta."""
    Dh = dim // heads

    def conv(name, t):  # t (N, C)
        w = sd[f"{prefix}.{name}.weight"][..., 0]
        return t @ w.T + sd[f"{prefix}.{name}.bias"]

    q = conv("attn.proj.0", x)
    k = conv("attn.proj.1", source)
    v = conv("attn.proj.2", source)

    def heads_of(t):  # official view(b, dim, h, n): c = dh*H + h
        N = t.shape[0]
        return t.reshape(N, Dh, heads)  # (N, dh, h)

    qh, kh, vh = heads_of(q), heads_of(k), heads_of(v)
    logits = np.einsum("ndh,mdh->hnm", qh, kh) / Dh**0.5
    a = np.exp(logits - logits.max(-1, keepdims=True))
    a /= a.sum(-1, keepdims=True)
    msg = np.einsum("hnm,mdh->ndh", a, vh)  # (N, dh, h)
    msg = msg.reshape(x.shape[0], dim)  # c = dh*H + h
    msg = conv("attn.merge", msg)
    y = np.concatenate([x, msg], -1)
    y = conv("mlp.0", y)
    mean = sd[f"{prefix}.mlp.1.running_mean"]
    var = sd[f"{prefix}.mlp.1.running_var"]
    y = (y - mean) / np.sqrt(var + 1e-5)
    y = y * sd[f"{prefix}.mlp.1.weight"] + sd[f"{prefix}.mlp.1.bias"]
    y = np.maximum(y, 0)
    y = conv("mlp.3", y)
    return x + y


def test_head_permutation_bijective():
    perm = _head_permutation(8, 2)
    assert sorted(perm.tolist()) == list(range(8))


def test_attentional_propagation_parity():
    dim, heads, N = 32, 2, 10
    rng = np.random.default_rng(1)
    sd = make_superglue_sd(n_layers=1, dim=dim, heads=heads, rng=rng)
    params, stats = convert_superglue(sd, n_layers=1, dim=dim, num_heads=heads)

    x = rng.normal(0, 1, (N, dim)).astype(np.float32)
    src = rng.normal(0, 1, (N, dim)).astype(np.float32)
    ref = official_attn_prop_np(x, src, sd, "gnn.layers.0", dim, heads)

    from gluefactory_tpu.models.matchers.superglue import AttentionalPropagation

    blk = AttentionalPropagation(dim, heads)
    variables = {"params": params["gnn_0"]}
    if "gnn_0" in stats:
        variables["batch_stats"] = stats["gnn_0"]
    out = blk.apply(variables, jnp.asarray(x[None]), jnp.asarray(src[None]), None, None, False)
    np.testing.assert_allclose(np.asarray(out)[0], ref, atol=2e-4)


def test_full_superglue_conversion_structure():
    from gluefactory_tpu.models.matchers.superglue import SuperGlue

    dim, heads, n_layers = 32, 2, 2
    sd = make_superglue_sd(n_layers=n_layers, dim=dim, heads=heads)
    params, stats = convert_superglue(sd, n_layers=n_layers, dim=dim, num_heads=heads)

    sg = SuperGlue.from_conf(
        {
            "descriptor_dim": dim,
            "keypoint_encoder": [8, 16, 24, 28],
            "n_layers": n_layers,
            "num_heads": heads,
            "checkpointed": False,
            "sinkhorn_iterations": 10,
        }
    )
    rng = np.random.default_rng(2)
    B, M = 1, 12
    data = {
        "keypoints0": jnp.asarray(rng.uniform(0, 256, (B, M, 2)), jnp.float32),
        "keypoints1": jnp.asarray(rng.uniform(0, 256, (B, M, 2)), jnp.float32),
        "descriptors0": jnp.asarray(rng.normal(size=(B, M, dim)), jnp.float32),
        "descriptors1": jnp.asarray(rng.normal(size=(B, M, dim)), jnp.float32),
        "keypoint_scores0": jnp.asarray(rng.uniform(0, 1, (B, M)), jnp.float32),
        "keypoint_scores1": jnp.asarray(rng.uniform(0, 1, (B, M)), jnp.float32),
        "view0": {"image_size": jnp.asarray([[256.0, 256.0]])},
        "view1": {"image_size": jnp.asarray([[256.0, 256.0]])},
    }
    ref_vars = sg.init({"params": jax.random.key(0)}, data)

    def paths(tree):
        return {
            tuple(str(k) for k in p): np.asarray(v).shape
            for p, v in jax.tree_util.tree_flatten_with_path(tree)[0]
        }

    assert paths(params) == paths(ref_vars["params"])
    pred = sg.apply({"params": params, "batch_stats": stats}, data)
    assert np.isfinite(np.asarray(pred["log_assignment"])).all()
