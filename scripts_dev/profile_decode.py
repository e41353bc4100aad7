"""Isolate detection-decode op costs on TPU: simple_nms, top_k, desc sampling.

Shapes match the bench config (8 images of 1024x1024, K=2048, 256-d).
"""

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
    import jax.numpy as jnp

    from gluefactory_tpu.ops.grid_sample import sample_descriptors
    from gluefactory_tpu.ops.nms import simple_nms, top_k_keypoints

    rng = np.random.default_rng(0)
    B, H, W, K, D = 8, 1024, 1024, 2048, 256
    scores = jnp.asarray(rng.uniform(0, 1, (B, H, W)), jnp.float32)
    dense = jnp.asarray(rng.normal(size=(B, H // 8, W // 8, D)), jnp.bfloat16)
    kpts = jnp.asarray(rng.uniform(0, W, (B, K, 2)), jnp.float32)

    t = {}
    t["simple_nms"] = chain_time(
        lambda c, s: simple_nms(s + c * 1e-12, 4).sum() * 1e-12, (scores,)
    )
    nmsed = simple_nms(scores, 4)
    t["top_k(tiled)"] = chain_time(
        lambda c, s: top_k_keypoints(s + c * 1e-12, K, 0.0, nms_radius=4)[1].sum()
        * 1e-12,
        (nmsed,),
    )
    t["top_k(flat)"] = chain_time(
        lambda c, s: top_k_keypoints(s + c * 1e-12, K, 0.0)[1].sum() * 1e-12,
        (nmsed,),
    )
    t["sample_desc"] = chain_time(
        lambda c, d, p: sample_descriptors(
            p + (c * 1e-12).astype(p.dtype), d, 8
        ).astype(jnp.float32).sum() * 1e-12,
        (dense, kpts),
    )
    print(json.dumps({k: round(1000 * v, 3) for k, v in t.items()}))


if __name__ == "__main__":
    main()
