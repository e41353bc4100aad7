"""Descriptor-sampling layout study (the last round-2 decode candidate):
compare the shipped 4-corner flat-gather bilinear sampler against

  - block: ONE gather of contiguous (2, 2, C) patches (vmapped dynamic_slice
    lowers to a single lax.gather of 2x2xC blocks) + weight blend — 1 gather
    instead of 4, C-contiguous rows stay contiguous;
  - onehot: bilinear weights scattered into a dense (N, Hc*Wc) matrix by
    broadcast-compare, sample = one big MXU einsum — trades 4 gathers for
    17 GFLOP/img of matmul.

Bench shapes: B=8 imgs, 128x128x256 bf16 map, 2048 kpts.
Run as `python -m scripts_dev.profile_desc_sampling` with the TPU free.
"""

import json
import time
from functools import partial

import numpy as np

B, Hc, Wc, D, K = 8, 128, 128, 256, 2048


def chain_time(fn, args, n=30):
    import jax
    import jax.numpy as jnp

    @partial(jax.jit, static_argnames=("n",))
    def run(args, n):
        def body(c, _):
            return fn(c, *args), None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
        return c

    float(run(args, n=n))
    t0 = time.perf_counter()
    float(run(args, n=n))
    return (time.perf_counter() - t0) / n


def corners(pts):
    import jax.numpy as jnp

    x = pts[..., 0] - 0.5
    y = pts[..., 1] - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    return (
        y0.astype(jnp.int32),
        x0.astype(jnp.int32),
        (x - x0).astype(jnp.float32),
        (y - y0).astype(jnp.float32),
    )


def sample_block(fmap, pts):
    """One (2,2,C)-block gather per keypoint, then the bilinear blend.
    Interior points only (the production path's borders are removed)."""
    import jax
    import jax.numpy as jnp

    Bb, H, W, C = fmap.shape
    y0, x0, wx, wy = corners(pts)
    y0 = jnp.clip(y0, 0, H - 2)
    x0 = jnp.clip(x0, 0, W - 2)

    def per_image(fm, ys, xs):
        return jax.vmap(
            lambda yy, xx: jax.lax.dynamic_slice(fm, (yy, xx, 0), (2, 2, C))
        )(ys, xs)

    blk = jax.vmap(per_image)(fmap, y0, x0)  # (B, N, 2, 2, C)
    wxe = wx[..., None]
    wye = wy[..., None]
    out = (
        blk[:, :, 0, 0] * (1 - wxe) * (1 - wye)
        + blk[:, :, 0, 1] * wxe * (1 - wye)
        + blk[:, :, 1, 0] * (1 - wxe) * wye
        + blk[:, :, 1, 1] * wxe * wye
    )
    return out.astype(fmap.dtype)


def sample_onehot(fmap, pts):
    """Dense (N, Hc*Wc) bilinear-weight matrix x flattened map on the MXU."""
    import jax.numpy as jnp

    Bb, H, W, C = fmap.shape
    y0, x0, wx, wy = corners(pts)
    y0 = jnp.clip(y0, 0, H - 2)
    x0 = jnp.clip(x0, 0, W - 2)
    p = jnp.arange(H * W, dtype=jnp.int32)[None, None, :]  # (1, 1, P)

    def hit(yy, xx, w):
        idx = (yy * W + xx)[..., None]  # (B, N, 1)
        return jnp.where(p == idx, w[..., None], 0.0)

    wmat = (
        hit(y0, x0, (1 - wx) * (1 - wy))
        + hit(y0, x0 + 1, wx * (1 - wy))
        + hit(y0 + 1, x0, (1 - wx) * wy)
        + hit(y0 + 1, x0 + 1, wx * wy)
    ).astype(fmap.dtype)
    flat = fmap.reshape(Bb, H * W, C)
    return jnp.einsum("bnp,bpc->bnc", wmat, flat)


def main():
    import jax
    import jax.numpy as jnp

    from gluefactory_tpu.ops.grid_sample import grid_sample_nd

    rng = np.random.default_rng(0)
    fmap = jnp.asarray(rng.normal(0, 1, (B, Hc, Wc, D)), jnp.bfloat16)
    # interior continuous points (border-removed production regime)
    pts = jnp.asarray(rng.uniform(1.5, Hc - 1.5, (B, K, 2)), jnp.float32)

    ref = np.asarray(grid_sample_nd(fmap, pts), np.float32)
    for name, fn in (("block", sample_block), ("onehot", sample_onehot)):
        got = np.asarray(fn(fmap, pts), np.float32)
        err = np.abs(got - ref).max()
        print(f"{name}: max abs err vs gather = {err:.4f}")

    out = {}
    for name, fn in (
        ("gather4", grid_sample_nd),
        ("block", sample_block),
        ("onehot", sample_onehot),
    ):
        def step(c, fm, pp, fn=fn):
            shift = (c * 1e-12).astype(fm.dtype)
            return fn(fm + shift, pp).astype(jnp.float32).sum() * 1e-20

        out[name] = chain_time(step, (fmap, pts)) * 1e3
        print(f"{name}: {out[name]:.3f} ms/iter (B={B} imgs)")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
