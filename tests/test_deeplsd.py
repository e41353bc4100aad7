"""Native DeepLSD: GT field generation, field->segment vectorization, and
the trainable DF/AF net (models/lines/deeplsd.py)."""

import pytest
import math

import jax
import jax.numpy as jnp
import numpy as np

from gluefactory_tpu.models.lines.deeplsd import (
    DeepLSD,
    DeepLSDNet,
    field_losses,
    fields_from_lines,
    lines_from_fields_host,
)


def _brute_force_fields(lines, mask, h, w, d_max):
    df = np.full((h, w), d_max, np.float64)
    ang = np.zeros((h, w), np.float64)
    best = np.full((h, w), np.inf)
    for (a, b), ok in zip(lines, mask):
        if not ok:
            continue
        ab = b - a
        len2 = float((ab**2).sum())
        if len2 <= 1e-6:
            continue
        th = math.atan2(ab[1], ab[0]) % math.pi
        for y in range(h):
            for x in range(w):
                p = np.asarray([x + 0.5, y + 0.5])
                t = np.clip(np.dot(p - a, ab) / len2, 0, 1)
                d = np.linalg.norm(p - (a + t * ab))
                if d < best[y, x]:
                    best[y, x] = d
                    df[y, x] = min(d, d_max)
                    ang[y, x] = th
    return df / d_max, ang


def test_fields_from_lines_matches_brute_force():
    rng = np.random.default_rng(0)
    h, w, L = 16, 20, 4
    lines = rng.uniform(1, 15, (L, 2, 2)).astype(np.float32)
    mask = np.asarray([True, True, False, True])
    df, ang = fields_from_lines(
        jnp.asarray(lines[None]), jnp.asarray(mask[None]), h, w, d_max=4.0
    )
    ref_df, ref_ang = _brute_force_fields(lines, mask, h, w, 4.0)
    np.testing.assert_allclose(np.asarray(df)[0], ref_df, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ang)[0], ref_ang, atol=1e-4)


def test_fields_from_lines_no_valid_lines():
    lines = jnp.zeros((1, 3, 2, 2))
    mask = jnp.zeros((1, 3), bool)
    df, ang = fields_from_lines(lines, mask, 8, 8)
    assert float(df.min()) == 1.0
    assert float(jnp.abs(ang).max()) == 0.0


def test_vectorizer_recovers_synthetic_segments():
    h = w = 160
    gt = np.asarray(
        [
            [[20.0, 30.0], [140.0, 40.0]],
            [[30.0, 120.0], [130.0, 60.0]],
            [[80.0, 20.0], [85.0, 140.0]],
        ],
        np.float32,
    )
    mask = np.ones(len(gt), bool)
    df, ang = fields_from_lines(
        jnp.asarray(gt[None]), jnp.asarray(mask[None]), h, w, d_max=5.0
    )
    lines, scores, valid = lines_from_fields_host(
        np.asarray(df), np.asarray(ang), max_lines=20, min_length=20.0
    )
    det = lines[0][valid[0]]
    assert len(det) >= len(gt), f"only {len(det)} detections"

    def seg_angle(s):
        d = s[1] - s[0]
        return math.atan2(d[1], d[0]) % math.pi

    def point_to_seg(p, s):
        a, b = s
        ab = b - a
        t = np.clip(np.dot(p - a, ab) / max(float((ab**2).sum()), 1e-6), 0, 1)
        return float(np.linalg.norm(p - (a + t * ab)))

    # every GT segment is recovered: some detection lies on it (both
    # endpoints within a few px of the GT support) with matching angle
    for g in gt:
        found = False
        for d in det:
            dth = abs(seg_angle(d) - seg_angle(g))
            dth = min(dth, math.pi - dth)
            if dth > math.radians(6):
                continue
            if max(point_to_seg(d[0], g), point_to_seg(d[1], g)) < 4.0:
                found = True
                break
        assert found, f"GT segment {g.tolist()} not recovered"
    # and every detection validates against the fields (precision): it must
    # lie on SOME GT segment
    for d in det:
        dist = min(
            max(point_to_seg(d[0], g), point_to_seg(d[1], g)) for g in gt
        )
        assert dist < 6.0, f"spurious detection {d.tolist()}"
    # scores normalized
    assert np.isclose(scores[0][valid[0]].max(), 1.0)


@pytest.mark.slow
def test_deeplsd_net_trains():
    rng = np.random.default_rng(1)
    h = w = 64
    gt_lines = np.asarray([[[8.0, 10.0], [56.0, 20.0]], [[30.0, 8.0], [34.0, 56.0]]], np.float32)
    gt_mask = np.ones(2, bool)
    gt_df, gt_ang = fields_from_lines(
        jnp.asarray(gt_lines[None]), jnp.asarray(gt_mask[None]), h, w
    )
    img = jnp.asarray(rng.uniform(0, 1, (1, h, w, 1)), jnp.float32)

    net = DeepLSDNet(channels=(8, 12, 16))
    params = net.init(jax.random.key(0), img)

    def loss_fn(p):
        df, ang = net.apply(p, img)
        return field_losses(df, ang, gt_df, gt_ang)["total"].mean()

    l0, g = jax.value_and_grad(loss_fn)(params)
    gnorm = jax.tree_util.tree_reduce(
        lambda acc, x: acc + float(jnp.abs(x).sum()), g, 0.0
    )
    assert np.isfinite(l0) and gnorm > 0

    import optax

    tx = optax.adam(1e-3)
    state = tx.init(params)
    p = params
    for _ in range(20):
        l, g = jax.value_and_grad(loss_fn)(p)
        upd, state = tx.update(g, state, p)
        p = optax.apply_updates(p, upd)
    l_end = loss_fn(p)
    assert float(l_end) < 0.7 * float(l0), (float(l0), float(l_end))


def test_deeplsd_model_contract():
    model = DeepLSD.from_conf(
        {"channels": [8, 12, 16], "max_num_lines": 16, "min_length": 10.0}
    )
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 1)), jnp.float32)
    data = {"image": img}
    variables = model.init(jax.random.key(0), data)
    out = model.apply(variables, data)
    assert out["lines"].shape == (2, 16, 2, 2)
    assert out["line_scores"].shape == (2, 16)
    assert out["line_mask"].dtype == jnp.bool_
    assert out["df"].shape == (2, 64, 64)

    # training path: fields only + loss against a line source in the batch
    pred = model.apply(variables, data, train=True)
    assert "lines" not in pred
    lines = jnp.asarray(
        np.asarray([[[8.0, 8.0], [50.0, 14.0]]], np.float32)[None].repeat(2, 0)
    )
    losses, _ = model.apply(
        variables,
        pred,
        {"lines": lines, "line_mask": jnp.ones((2, 1), bool)},
        method=model.loss,
    )
    assert np.isfinite(float(losses["total"].mean()))
