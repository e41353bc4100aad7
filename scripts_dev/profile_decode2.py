"""Decode optimization candidates: bf16 NMS/top-k, approx_max_k."""
import json
import time
from functools import partial

import numpy as np


def chain_time(fn, args, n=20):
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


def main():
    import jax
    import jax.numpy as jnp

    from gluefactory_tpu.ops.nms import simple_nms, top_k_keypoints

    rng = np.random.default_rng(0)
    B, H, W, K = 8, 1024, 1024, 2048
    scores32 = jnp.asarray(rng.uniform(0, 1, (B, H, W)), jnp.float32)
    scores16 = scores32.astype(jnp.bfloat16)
    nmsed32 = simple_nms(scores32, 4)
    nmsed16 = simple_nms(scores16, 4)

    t = {}
    t["nms_f32"] = chain_time(
        lambda c, s: simple_nms(s + c * 1e-12, 4).sum().astype(jnp.float32) * 1e-12,
        (scores32,),
    )
    t["nms_bf16"] = chain_time(
        lambda c, s: simple_nms(
            s + (c * 1e-12).astype(s.dtype), 4
        ).sum().astype(jnp.float32) * 1e-12,
        (scores16,),
    )
    t["topk_f32"] = chain_time(
        lambda c, s: top_k_keypoints(s + c * 1e-12, K, 0.0, nms_radius=4)[1]
        .sum().astype(jnp.float32) * 1e-12,
        (nmsed32,),
    )
    t["topk_bf16"] = chain_time(
        lambda c, s: top_k_keypoints(
            s + (c * 1e-12).astype(s.dtype), K, 0.0, nms_radius=4
        )[1].sum().astype(jnp.float32) * 1e-12,
        (nmsed16,),
    )

    # tile-reduce + approx_max_k (TPU-native top-k)
    def topk_approx(c, s):
        s = s + (c * 1e-12).astype(s.dtype)
        Bx, Hx, Wx = s.shape
        tile = 4
        blocks = s.reshape(Bx, Hx // tile, tile, Wx // tile, tile)
        tile_max = blocks.max(axis=(2, 4)).reshape(Bx, -1)
        vals, idx = jax.lax.approx_max_k(tile_max, K, recall_target=0.99)
        return vals.sum().astype(jnp.float32) * 1e-12

    t["topk_tile_approx"] = chain_time(topk_approx, (nmsed16,))

    # plain tile-max reduce only (lower bound for any tile-based top-k)
    def tile_reduce_only(c, s):
        s = s + (c * 1e-12).astype(s.dtype)
        Bx, Hx, Wx = s.shape
        blocks = s.reshape(Bx, Hx // 4, 4, Wx // 4, 4)
        return blocks.max(axis=(2, 4)).sum().astype(jnp.float32) * 1e-12

    t["tile_reduce_only"] = chain_time(tile_reduce_only, (nmsed16,))

    print(json.dumps({k: round(v * 1e3, 3) for k, v in t.items()}))


if __name__ == "__main__":
    main()
