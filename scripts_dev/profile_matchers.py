"""TPU throughput for the non-LightGlue matcher zoo (VERDICT r4 next #4).

Measures, with the bench.py chained-scan methodology (iterations chained on
the previous output inside one jitted lax.scan, one tunnel round-trip per
measurement):

- SP+SuperGlue end-to-end (1024px images, 2048 kpts, B=4, bf16, 50-iteration
  log-Sinkhorn, reference `gluefactory_nonfree/superglue.py:186-214`), in
  TWO arms: the Pallas VMEM-resident Sinkhorn kernel (ops/pallas_sinkhorn.py)
  vs the XLA fori_loop fallback — the kernel-vs-XLA choice is a measured
  decision, not a guess.
- SP+GlueStick on-device path at the shipped recipe shape
  (640x480 images, 1000 junctions, 250 lines, 9 GNN layer-pairs, B=4, bf16;
  reference `models/matchers/gluestick.py:589-691`). Line endpoints/indices
  are fabricated on-device from the extracted keypoints (static shapes,
  faithful GNN compute); host LSD cost is timed separately below since line
  detection runs on host in the loader (configs/superpoint+lsd+gluestick*).
- Host cv2-LSD ms/image at both shapes, to compose the full serving picture
  (in production the loader's LSD overlaps device compute).

Usage: python scripts_dev/profile_matchers.py [superglue|gluestick|lsd|all]
Prints one JSON line per measurement.
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = 30
V5E_BF16_PEAK_FLOPS = 197e12


def _cast_bf16(jnp, tree):
    import jax

    return jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if isinstance(x, jnp.ndarray) and x.dtype == jnp.float32
        else x,
        tree,
    )


def _measure(jax, compiled, *args):
    float(np.asarray(compiled(*args)).sum())  # warm
    t0 = time.perf_counter()
    float(np.asarray(compiled(*args)).sum())
    return time.perf_counter() - t0


def _flops(compiled, iters):
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return (float(ca.get("flops", 0.0)) * iters) or None
    except Exception:
        return None


def bench_superglue(arm: str):
    """SP+SuperGlue end-to-end; arm in {pallas, xla}."""
    import jax
    import jax.numpy as jnp

    from gluefactory_tpu.models import get_model

    if arm == "xla":
        from gluefactory_tpu.ops import pallas_sinkhorn

        pallas_sinkhorn.sinkhorn_available = lambda *a, **k: False

    B, S, K = 4, 1024, 2048
    model = get_model("two_view_pipeline").from_conf(
        {
            "extractor": {
                "name": "superpoint",
                "max_num_keypoints": K,
                "detection_threshold": 0.0,
                "force_num_keypoints": True,
                "trainable": False,
            },
            "matcher": {"name": "superglue", "sinkhorn_iterations": 50, "checkpointed": False},
        }
    )
    rng = np.random.default_rng(0)
    size = jnp.tile(jnp.asarray([[float(S), float(S)]], jnp.float32), (B, 1))
    batch = {
        f"view{i}": {
            "image": jnp.asarray(rng.uniform(0, 1, (B, S, S, 1)), jnp.float32),
            "image_size": size,
        }
        for i in (0, 1)
    }
    batch1 = jax.tree.map(lambda x: x[:1] if isinstance(x, jnp.ndarray) else x, batch)
    variables = model.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)}, batch1
    )
    variables = _cast_bf16(jnp, variables)
    batch = _cast_bf16(jnp, batch)

    @partial(jax.jit, static_argnames=("n",))
    def bench_fn(variables, batch, n):
        def body(carry, _):
            b = dict(batch)
            b["view0"] = dict(b["view0"])
            b["view0"]["image"] = b["view0"]["image"] + (carry * 1e-12).astype(
                b["view0"]["image"].dtype
            )
            out = model.apply(variables, b, rngs={"sample": jax.random.key(2)})
            return out["matching_scores0"].astype(jnp.float32).sum() * 1e-20, None

        carry, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
        return carry

    compiled = bench_fn.lower(variables, batch, n=ITERS).compile()
    flops = _flops(compiled, ITERS)
    dt = _measure(jax, compiled, variables, batch)
    pps = B * ITERS / dt
    out = {
        "metric": f"SP+SuperGlue e2e pairs/s (sinkhorn50-{arm}, {K}kpts, {S}px, bf16, B={B})",
        "pairs_per_sec": round(pps, 2),
        "ms_per_pair": round(1000.0 / pps, 3),
    }
    if flops:
        out["mfu"] = round(flops / dt / V5E_BF16_PEAK_FLOPS, 4)
        out["gflops_per_pair"] = round(flops / (B * ITERS) / 1e9, 1)
    print(json.dumps(out), flush=True)


def bench_gluestick():
    """SP extraction + GlueStick GNN at the shipped recipe shape."""
    import jax
    import jax.numpy as jnp

    from gluefactory_tpu.models import get_model

    B, W, H, K, L = 4, 640, 480, 1000, 250
    extractor = get_model("superpoint").from_conf(
        {
            "max_num_keypoints": K,
            "detection_threshold": 0.0,
            "force_num_keypoints": True,
            "trainable": False,
        }
    )
    matcher = get_model("gluestick").from_conf(
        {"input_dim": 256, "descriptor_dim": 256, "checkpointed": False}
    )
    rng = np.random.default_rng(0)
    size = jnp.tile(jnp.asarray([[float(W), float(H)]], jnp.float32), (B, 1))
    images = {
        i: jnp.asarray(rng.uniform(0, 1, (B, H, W, 1)), jnp.float32) for i in (0, 1)
    }
    # static-shape fabricated line topology (indices into the junction set)
    junc_idx = {
        i: jnp.asarray(rng.integers(0, K, (B, 2 * L)), jnp.int32) for i in (0, 1)
    }
    line_scores = {
        i: jnp.asarray(rng.uniform(0.2, 1.0, (B, L)), jnp.float32) for i in (0, 1)
    }

    def build_matcher_input(feats0, feats1):
        data = {"view0": {"image_size": size}, "view1": {"image_size": size}}
        for i, feats in ((0, feats0), (1, feats1)):
            kpts = feats["keypoints"]
            data[f"keypoints{i}"] = kpts
            data[f"keypoint_scores{i}"] = feats["keypoint_scores"]
            data[f"descriptors{i}"] = feats["descriptors"]
            ends = jnp.take_along_axis(kpts, junc_idx[i][..., None], axis=1)
            data[f"lines{i}"] = ends.reshape(B, L, 2, 2)
            data[f"lines_junc_idx{i}"] = junc_idx[i]
            data[f"line_scores{i}"] = line_scores[i].astype(kpts.dtype)
        return data

    feats_stub = extractor.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        {"image": images[0][:1], "image_size": size[:1]},
    )
    ex_vars = _cast_bf16(jnp, feats_stub)
    f0 = extractor.apply(
        ex_vars,
        {"image": images[0][:1].astype(jnp.bfloat16), "image_size": size[:1]},
        rngs={"sample": jax.random.key(2)},
    )
    m_vars = matcher.init(
        {"params": jax.random.key(3)},
        build_matcher_input(
            jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape[1:]), f0),
            jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape[1:]), f0),
        ),
    )
    m_vars = _cast_bf16(jnp, m_vars)
    images = _cast_bf16(jnp, images)

    @partial(jax.jit, static_argnames=("n",))
    def bench_fn(ex_vars, m_vars, images, n):
        def body(carry, _):
            im0 = images[0] + (carry * 1e-12).astype(images[0].dtype)
            feats0 = extractor.apply(
                ex_vars, {"image": im0, "image_size": size},
                rngs={"sample": jax.random.key(2)},
            )
            feats1 = extractor.apply(
                ex_vars, {"image": images[1], "image_size": size},
                rngs={"sample": jax.random.key(2)},
            )
            out = matcher.apply(m_vars, build_matcher_input(feats0, feats1))
            return out["matching_scores0"].astype(jnp.float32).sum() * 1e-20, None

        carry, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
        return carry

    compiled = bench_fn.lower(ex_vars, m_vars, images, n=ITERS).compile()
    flops = _flops(compiled, ITERS)
    dt = _measure(jax, compiled, ex_vars, m_vars, images)
    pps = B * ITERS / dt
    out = {
        "metric": (
            f"SP+GlueStick on-device pairs/s ({K}junc, {L}lines, "
            f"{W}x{H}, 9 GNN pairs, bf16, B={B})"
        ),
        "pairs_per_sec": round(pps, 2),
        "ms_per_pair": round(1000.0 / pps, 3),
        "note": "host LSD excluded (runs in the loader; see lsd mode)",
    }
    if flops:
        out["mfu"] = round(flops / dt / V5E_BF16_PEAK_FLOPS, 4)
        out["gflops_per_pair"] = round(flops / (B * ITERS) / 1e9, 1)
    print(json.dumps(out), flush=True)


def bench_lsd():
    """Host cv2 LSD ms/image (loader-side cost of the GlueStick pipeline)."""
    import cv2

    from gluefactory_tpu.data.homographies import generate_synthetic_image

    for w, h in ((640, 480), (1024, 1024)):
        img = (generate_synthetic_image(0, (w, h)) * 255).astype(np.uint8)
        gray = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)
        lsd = cv2.createLineSegmentDetector(cv2.LSD_REFINE_ADV)
        lsd.detect(gray)  # warm
        n, t0 = 10, time.perf_counter()
        for _ in range(n):
            lsd.detect(gray)
        ms = (time.perf_counter() - t0) / n * 1000
        print(
            json.dumps(
                {"metric": f"host cv2-LSD ms/image ({w}x{h})", "ms": round(ms, 2)}
            ),
            flush=True,
        )


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    if mode in ("lsd", "all"):
        bench_lsd()
    if mode in ("gluestick", "all"):
        bench_gluestick()
    if mode in ("superglue", "all"):
        bench_superglue("pallas")
        bench_superglue("xla")
    if mode == "superglue_pallas":
        bench_superglue("pallas")
    if mode == "superglue_xla":
        bench_superglue("xla")
