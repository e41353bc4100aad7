import jax
import jax.numpy as jnp
import numpy as np

from gluefactory_tpu.ops.assignment import (
    filter_matches,
    find_nn,
    log_double_softmax,
    log_optimal_transport,
    mutual_check,
    sigmoid_log_double_softmax,
)
from gluefactory_tpu.ops.attention import apply_rotary, bidirectional_attention, mha
from gluefactory_tpu.ops.grid_sample import grid_sample_nd, sample_descriptors
from gluefactory_tpu.ops.nms import (
    remove_borders,
    simple_nms,
    soft_argmax_refinement,
    top_k_keypoints,
)


def test_simple_nms_isolated_peaks():
    scores = jnp.zeros((1, 32, 32))
    scores = scores.at[0, 5, 5].set(1.0).at[0, 20, 20].set(0.8).at[0, 5, 7].set(0.5)
    out = np.asarray(simple_nms(scores, radius=2))
    assert out[0, 5, 5] == 1.0
    assert out[0, 20, 20] == 0.8
    assert out[0, 5, 7] == 0.0  # suppressed by nearby stronger peak


def test_remove_borders():
    scores = jnp.ones((1, 16, 16))
    out = np.asarray(remove_borders(scores, 4))
    assert out[0, 0, 0] == 0 and out[0, 8, 8] == 1 and out[0, 3, 8] == 0


def test_top_k_keypoints():
    scores = jnp.zeros((2, 16, 16))
    scores = scores.at[0, 3, 4].set(0.9).at[0, 10, 2].set(0.5)
    scores = scores.at[1, 7, 7].set(0.7)
    kpts, vals, valid = top_k_keypoints(scores, k=4, threshold=0.1)
    kpts, vals, valid = np.asarray(kpts), np.asarray(vals), np.asarray(valid)
    assert valid[0].sum() == 2 and valid[1].sum() == 1
    np.testing.assert_allclose(kpts[0, 0], [4.5, 3.5])  # x, y + 0.5
    np.testing.assert_allclose(kpts[1, 0], [7.5, 7.5])


def test_soft_argmax_refinement():
    # a symmetric blob: refinement should stay at center
    scores = jnp.zeros((1, 16, 16))
    scores = scores.at[0, 8, 8].set(1.0)
    for dy, dx in [(-1, 0), (1, 0), (0, -1), (0, 1)]:
        scores = scores.at[0, 8 + dy, 8 + dx].set(0.5)
    kpts = jnp.asarray([[[8.5, 8.5]]])
    ref = np.asarray(soft_argmax_refinement(kpts, scores, radius=2))
    np.testing.assert_allclose(ref[0, 0], [8.5, 8.5], atol=1e-5)
    # asymmetric blob pulls the keypoint toward the heavier side
    scores2 = scores.at[0, 8, 9].set(1.0)
    ref2 = np.asarray(soft_argmax_refinement(kpts, scores2, radius=2))
    assert ref2[0, 0, 0] > 8.5


def test_grid_sample_matches_manual():
    rng = np.random.default_rng(0)
    fmap = jnp.asarray(rng.normal(size=(1, 8, 8, 4)), jnp.float32)
    # at exact pixel centers, sampling returns the pixel value
    pts = jnp.asarray([[[2.5, 3.5]]])
    out = np.asarray(grid_sample_nd(fmap, pts))
    np.testing.assert_allclose(out[0, 0], np.asarray(fmap)[0, 3, 2], atol=1e-6)
    # halfway between two pixels = average
    pts2 = jnp.asarray([[[3.0, 3.5]]])
    out2 = np.asarray(grid_sample_nd(fmap, pts2))
    np.testing.assert_allclose(
        out2[0, 0], 0.5 * (np.asarray(fmap)[0, 3, 2] + np.asarray(fmap)[0, 3, 3]), atol=1e-6
    )


def test_sample_descriptors_normalized():
    rng = np.random.default_rng(1)
    dmap = jnp.asarray(rng.normal(size=(2, 16, 16, 32)), jnp.float32)
    kpts = jnp.asarray(rng.uniform(0, 128, size=(2, 10, 2)), jnp.float32)
    desc = np.asarray(sample_descriptors(kpts, dmap, stride=8))
    np.testing.assert_allclose(np.linalg.norm(desc, axis=-1), 1.0, atol=1e-4)


def test_sigmoid_log_double_softmax_properties():
    rng = np.random.default_rng(2)
    sim = jnp.asarray(rng.normal(size=(1, 6, 8)), jnp.float32)
    z0 = jnp.asarray(rng.normal(size=(1, 6)), jnp.float32)
    z1 = jnp.asarray(rng.normal(size=(1, 8)), jnp.float32)
    scores = np.asarray(sigmoid_log_double_softmax(sim, z0, z1))
    assert scores.shape == (1, 7, 9)
    assert (scores <= 1e-6).all()
    # unmatched prob of point i = sigmoid(-z0_i)
    np.testing.assert_allclose(
        np.exp(scores[0, :6, 8]), 1.0 / (1.0 + np.exp(np.asarray(z0)[0])), atol=1e-5
    )


def test_sigmoid_log_double_softmax_mask_inert():
    """Padding keypoints must not affect the scores of real ones."""
    rng = np.random.default_rng(3)
    sim_full = jnp.asarray(rng.normal(size=(1, 8, 8)), jnp.float32)
    z0 = jnp.asarray(rng.normal(size=(1, 8)), jnp.float32)
    z1 = jnp.asarray(rng.normal(size=(1, 8)), jnp.float32)
    mask = jnp.asarray([[True] * 5 + [False] * 3])
    s_masked = np.asarray(sigmoid_log_double_softmax(sim_full, z0, z1, mask, mask))
    s_small = np.asarray(
        sigmoid_log_double_softmax(sim_full[:, :5, :5], z0[:, :5], z1[:, :5])
    )
    np.testing.assert_allclose(s_masked[0, :5, :5], s_small[0, :5, :5], atol=1e-5)


def test_log_optimal_transport_marginals():
    rng = np.random.default_rng(4)
    scores = jnp.asarray(rng.normal(size=(1, 5, 7)), jnp.float32)
    Z = log_optimal_transport(scores, bin_score=0.5, iters=50)
    P = np.exp(np.asarray(Z))[0]
    assert P.shape == (6, 8)
    # after the final de-normalization (reference superglue.py:213 Z - norm),
    # every real row and column has total mass 1
    np.testing.assert_allclose(P[:5].sum(axis=1), 1.0, atol=1e-3)
    np.testing.assert_allclose(P[:, :7].sum(axis=0), 1.0, atol=1e-3)


def test_log_optimal_transport_mask_inert():
    rng = np.random.default_rng(5)
    sim = jnp.asarray(rng.normal(size=(1, 6, 6)), jnp.float32)
    mask = jnp.asarray([[True] * 4 + [False] * 2])
    Z_masked = np.asarray(log_optimal_transport(sim, 0.3, 60, mask, mask))
    Z_small = np.asarray(log_optimal_transport(sim[:, :4, :4], 0.3, 60))
    np.testing.assert_allclose(Z_masked[0, :4, :4], Z_small[0, :4, :4], atol=1e-3)


def test_filter_matches_mutual():
    # construct a log-assignment with an obvious diagonal
    M = N = 4
    inner = jnp.full((1, M, N), -10.0)
    inner = inner.at[0, jnp.arange(3), jnp.arange(3)].set(-0.01)
    scores = jnp.full((1, M + 1, N + 1), -10.0).at[:, :M, :N].set(inner)
    m0, m1, s0, s1 = filter_matches(scores, th=0.5)
    np.testing.assert_array_equal(np.asarray(m0)[0], [0, 1, 2, -1])
    np.testing.assert_array_equal(np.asarray(m1)[0], [0, 1, 2, -1])
    assert (np.asarray(s0)[0, :3] > 0.9).all()


def test_find_nn_and_mutual_check():
    desc0 = jnp.asarray([[[1.0, 0.0], [0.0, 1.0]]])
    desc1 = jnp.asarray([[[0.0, 1.0], [1.0, 0.0], [0.7, 0.7]]])
    sim = jnp.einsum("bnd,bmd->bnm", desc0, desc1)
    m, s = find_nn(sim)
    np.testing.assert_array_equal(np.asarray(m)[0], [1, 0])
    m1, _ = find_nn(jnp.swapaxes(sim, 1, 2))
    mm = mutual_check(m, m1)
    np.testing.assert_array_equal(np.asarray(mm)[0], [1, 0])


def naive_mha(q, k, v):
    d = q.shape[-1]
    logits = np.einsum("bhmd,bhnd->bhmn", q, k) / np.sqrt(d)
    a = np.exp(logits - logits.max(-1, keepdims=True))
    a = a / a.sum(-1, keepdims=True)
    return np.einsum("bhmn,bhnd->bhmd", a, v)


def test_mha_matches_naive():
    rng = np.random.default_rng(6)
    q = rng.normal(size=(2, 4, 8, 16)).astype(np.float32)
    k = rng.normal(size=(2, 4, 10, 16)).astype(np.float32)
    v = rng.normal(size=(2, 4, 10, 16)).astype(np.float32)
    out = np.asarray(mha(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    np.testing.assert_allclose(out, naive_mha(q, k, v), atol=1e-4)


def test_mha_mask_inert():
    rng = np.random.default_rng(7)
    q = rng.normal(size=(1, 2, 6, 8)).astype(np.float32)
    k = rng.normal(size=(1, 2, 6, 8)).astype(np.float32)
    v = rng.normal(size=(1, 2, 6, 8)).astype(np.float32)
    mask = np.array([[True] * 4 + [False] * 2])
    out_m = np.asarray(
        mha(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(mask), jnp.asarray(mask))
    )
    out_s = naive_mha(q[:, :, :4], k[:, :, :4], v[:, :, :4])
    np.testing.assert_allclose(out_m[:, :, :4], out_s, atol=1e-4)
    assert np.abs(out_m[:, :, 4:]).max() == 0.0


def test_bidirectional_attention_consistency():
    rng = np.random.default_rng(8)
    qk0 = jnp.asarray(rng.normal(size=(1, 2, 5, 8)), jnp.float32)
    qk1 = jnp.asarray(rng.normal(size=(1, 2, 7, 8)), jnp.float32)
    v0 = jnp.asarray(rng.normal(size=(1, 2, 5, 8)), jnp.float32)
    v1 = jnp.asarray(rng.normal(size=(1, 2, 7, 8)), jnp.float32)
    m0, m1 = bidirectional_attention(qk0, qk1, v0, v1)
    ref0 = np.asarray(mha(qk0, qk1, v1))
    ref1 = np.asarray(mha(qk1, qk0, v0))
    np.testing.assert_allclose(np.asarray(m0), ref0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(m1), ref1, atol=1e-4)


def test_apply_rotary_preserves_norm():
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.normal(size=(1, 10, 16)), jnp.float32)
    theta = jnp.asarray(rng.normal(size=(1, 10, 8)), jnp.float32)
    out = apply_rotary(x, jnp.cos(theta), jnp.sin(theta))
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out), axis=-1),
        np.linalg.norm(np.asarray(x), axis=-1),
        atol=1e-4,
    )
    # rotary of zero angle is identity
    out2 = apply_rotary(x, jnp.ones_like(theta), jnp.zeros_like(theta))
    np.testing.assert_allclose(np.asarray(out2), np.asarray(x), atol=1e-6)


def test_bf16_dtype_preserved_through_rotary_and_sampling():
    """Regression: two silent f32 upcasts used to poison the whole matcher
    (rotary tables derived from f32 keypoint coords; f32 interpolation
    weights in sample_descriptors) — see ROADMAP round-4 perf log. A bf16
    input must come out bf16 from both ops."""
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(1, 10, 16)), jnp.bfloat16)
    theta = jnp.asarray(rng.normal(size=(1, 10, 8)), jnp.float32)
    out = apply_rotary(x, jnp.cos(theta), jnp.sin(theta))
    assert out.dtype == jnp.bfloat16

    dmap = jnp.asarray(rng.normal(size=(2, 16, 16, 32)), jnp.bfloat16)
    kpts = jnp.asarray(rng.uniform(0, 128, size=(2, 10, 2)), jnp.float32)
    desc = sample_descriptors(kpts, dmap, stride=8)
    assert desc.dtype == jnp.bfloat16
    # raw grid_sample_nd is dtype-preserving too (it sits inside bf16
    # trunks: ALIKED deformable convs, RoMa refiners)
    raw = grid_sample_nd(dmap, kpts / 8.0)
    assert raw.dtype == jnp.bfloat16


def test_log_double_softmax_shape():
    rng = np.random.default_rng(10)
    sim = jnp.asarray(rng.normal(size=(1, 4, 5)), jnp.float32)
    out = np.asarray(log_double_softmax(sim, 1.0))
    assert out.shape == (1, 5, 6)
    assert (out[:, :4, :5] <= 0).all()


def test_warp_perspective_matches_cv2():
    import cv2

    from gluefactory_tpu.ops.warp import warp_perspective

    rng = np.random.default_rng(11)
    img = rng.uniform(0, 1, (60, 80, 3)).astype(np.float32)
    img = cv2.GaussianBlur(img, (5, 5), 1.0)  # smooth -> interp differences small
    H = np.array(
        [[1.05, 0.03, -4.0], [-0.02, 0.98, 3.0], [1e-4, -5e-5, 1.0]], np.float32
    )
    ref = cv2.warpPerspective(img, H, (80, 60), flags=cv2.INTER_LINEAR)
    out = np.asarray(warp_perspective(jnp.asarray(img[None]), jnp.asarray(H[None]), (80, 60)))[0]
    # compare away from boundaries (border handling differs)
    diff = np.abs(out[5:-5, 5:-5] - ref[5:-5, 5:-5])
    assert np.quantile(diff, 0.99) < 0.03, np.quantile(diff, 0.99)


def test_warp_perspective_tiled_exact_parity():
    """The MXU-matmul tiled warp must EXACTLY match the gather warp wherever
    each tile's source footprint fits the window (here: window >= source)."""
    from gluefactory_tpu.ops.warp import warp_perspective, warp_perspective_tiled

    rng = np.random.default_rng(21)
    img = rng.uniform(0, 1, (2, 48, 64, 3)).astype(np.float32)
    H = np.stack(
        [
            np.array([[1.1, 0.08, -6.0], [-0.05, 0.95, 4.0], [2e-4, -1e-4, 1.0]]),
            np.array([[0.8, -0.2, 10.0], [0.15, 0.9, -3.0], [-1e-4, 2e-4, 1.0]]),
        ]
    ).astype(np.float32)
    ref = np.asarray(warp_perspective(jnp.asarray(img), jnp.asarray(H), (64, 48)))
    out = np.asarray(
        warp_perspective_tiled(
            jnp.asarray(img), jnp.asarray(H), (64, 48),
            tile=(16, 32), window=(64, 96),
        )
    )
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_warp_perspective_tiled_nondivisible_output():
    from gluefactory_tpu.ops.warp import warp_perspective, warp_perspective_tiled

    rng = np.random.default_rng(22)
    img = rng.uniform(0, 1, (1, 40, 56, 1)).astype(np.float32)
    H = np.eye(3, dtype=np.float32)[None] * 1.0
    H[0, 0, 2] = 3.0  # translation
    ref = np.asarray(warp_perspective(jnp.asarray(img), jnp.asarray(H), (50, 30)))
    out = np.asarray(
        warp_perspective_tiled(
            jnp.asarray(img), jnp.asarray(H), (50, 30),
            tile=(16, 32), window=(56, 72),
        )
    )
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_photometric_jitter_bounds():
    from gluefactory_tpu.ops.warp import photometric_jitter

    rng = np.random.default_rng(12)
    img = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 3)), jnp.float32)
    out = photometric_jitter(img, jax.random.key(0))
    assert out.shape == img.shape
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0
    # deterministic given the key
    out2 = photometric_jitter(img, jax.random.key(0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2))


def test_tiled_topk_exact_after_nms():
    """With NMS'd scores, the tiled two-stage top-k must equal the flat one."""
    rng = np.random.default_rng(13)
    scores = jnp.asarray(rng.uniform(0, 1, (2, 64, 96)), jnp.float32)
    nmsed = simple_nms(scores, radius=3)
    k = 32
    kp_a, v_a, m_a = top_k_keypoints(nmsed, k, 0.0)
    kp_b, v_b, m_b = top_k_keypoints(nmsed, k, 0.0, nms_radius=3)
    np.testing.assert_allclose(np.asarray(v_a), np.asarray(v_b), atol=1e-7)
    np.testing.assert_array_equal(np.asarray(m_a), np.asarray(m_b))
    # same positions for valid entries (ordering of equal scores may differ)
    va = np.asarray(m_a)
    np.testing.assert_allclose(
        np.sort(np.asarray(kp_a)[va].ravel()), np.sort(np.asarray(kp_b)[va].ravel()), atol=1e-5
    )


def test_vgg_block1_s2d_exact():
    """Space-to-depth block1 == conv/relu/conv/relu/pool reference chain."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gluefactory_tpu.ops.s2d_conv import vgg_block1_s2d

    rng = np.random.default_rng(0)
    B, H, W, C = 2, 16, 24, 8
    x = jnp.asarray(rng.normal(size=(B, H, W, 1)), jnp.float32)
    wa = jnp.asarray(rng.normal(0, 0.5, (3, 3, 1, C)), jnp.float32)
    ba = jnp.asarray(rng.normal(0, 0.5, (C,)), jnp.float32)
    wb = jnp.asarray(rng.normal(0, 0.2, (3, 3, C, C)), jnp.float32)
    bb = jnp.asarray(rng.normal(0, 0.5, (C,)), jnp.float32)

    def plain(x):
        y = jax.lax.conv_general_dilated(
            x, wa, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        ) + ba
        y = jax.nn.relu(y)
        y = jax.lax.conv_general_dilated(
            y, wb, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        ) + bb
        y = jax.nn.relu(y)
        return jax.lax.reduce_window(
            y, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
        )

    ref = plain(x)
    out = vgg_block1_s2d(x, wa, ba, wb, bb)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_superpoint_s2d_block1_matches_plain():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gluefactory_tpu.models.extractors.superpoint import SuperPoint

    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 1)), jnp.float32)
    conf = {"max_num_keypoints": 32, "detection_threshold": 0.0,
            "dense_outputs": True}
    sp_plain = SuperPoint.from_conf({**conf, "s2d_block1": False})
    variables = sp_plain.init({"params": jax.random.key(0)}, {"image": img})
    out_plain = sp_plain.apply(variables, {"image": img})
    sp_s2d = SuperPoint.from_conf({**conf, "s2d_block1": True})
    out_s2d = sp_s2d.apply(variables, {"image": img})
    np.testing.assert_allclose(
        np.asarray(out_s2d["dense_score_map"]),
        np.asarray(out_plain["dense_score_map"]),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out_s2d["keypoints"]), np.asarray(out_plain["keypoints"]), atol=1e-4
    )


def test_topk_packed_bf16_matches_f32_path():
    """The packed-key bf16 top-k fast path must select the same positive
    survivor set (kpts + scores) as the exact f32 path on NMS'd maps."""
    import jax.numpy as jnp
    import numpy as np

    from gluefactory_tpu.ops.nms import simple_nms, top_k_keypoints

    rng = np.random.default_rng(0)
    B, H, W, K = 2, 128, 128, 64
    # tie-free peak map: ~140 peaks on a coarse grid, values k/512 (exactly
    # representable and DISTINCT in bf16), zero elsewhere — any tie-breaking
    # difference between the two paths would be a real bug here
    raw = np.zeros((B, H, W), np.float32)
    for b in range(B):
        cells = [(y, x) for y in range(6, H - 6, 10) for x in range(6, W - 6, 10)]
        order = rng.permutation(len(cells))
        for rank, ci in enumerate(order):
            y, x = cells[ci]
            raw[b, y + rng.integers(-2, 3), x + rng.integers(-2, 3)] = (
                rank + 1
            ) / 512.0
    s16 = jnp.asarray(raw).astype(jnp.bfloat16)
    s32 = s16.astype(jnp.float32)
    n16 = simple_nms(s16, 4)
    n32 = simple_nms(s32, 4)
    k16, v16, m16 = top_k_keypoints(n16, K, 0.0, nms_radius=4)
    k32, v32, m32 = top_k_keypoints(n32, K, 0.0, nms_radius=4)

    for b in range(B):
        sa = {
            (float(x), float(y), float(s))
            for (x, y), s, ok in zip(
                np.asarray(k16)[b], np.asarray(v16, np.float32)[b],
                np.asarray(m16)[b],
            )
            if ok
        }
        sb = {
            (float(x), float(y), float(s))
            for (x, y), s, ok in zip(
                np.asarray(k32)[b], np.asarray(v32)[b], np.asarray(m32)[b]
            )
            if ok
        }
        assert sa == sb
        assert len(sa) == K
