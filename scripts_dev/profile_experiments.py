"""Perf experiments: backbone batch scaling + attention block_q tuning."""

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

    from gluefactory_tpu.models import get_model
    from gluefactory_tpu.ops.pallas_attention import fused_attention

    rng = np.random.default_rng(0)
    out = {}

    # backbone batch scaling (dense maps only; decode DCE'd)
    sp = get_model("superpoint").from_conf(
        {"max_num_keypoints": 512, "detection_threshold": 0.0,
         "force_num_keypoints": True, "trainable": False, "dense_outputs": True}
    )
    # init once at tiny res (conv params are resolution-independent)
    tiny = {"image": jnp.zeros((1, 256, 256, 1), jnp.bfloat16),
            "image_size": jnp.asarray([[256, 256]], jnp.float32)}
    spv = sp.init({"params": jax.random.key(0), "sample": jax.random.key(1)}, tiny)
    spv = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, spv
    )
    for nb in (8, 16):  # 32 OOMs at 1024^2 (conv1 activations)
        img = jnp.asarray(
            rng.uniform(0, 1, (nb, 1024, 1024, 1)), jnp.float32
        ).astype(jnp.bfloat16)
        size = jnp.tile(jnp.asarray([[1024, 1024]], jnp.float32), (nb, 1))

        def dense_fn(c, im):
            o = sp.apply(spv, {"image": im + (c * 1e-12).astype(im.dtype),
                               "image_size": size},
                         rngs={"sample": jax.random.key(2)})
            return o["dense_score_map"].astype(jnp.float32).sum() * 1e-12

        t = chain_time(dense_fn, (img,), n=10)
        out[f"dense_b{nb}_ms_per_image"] = round(1000 * t / nb, 3)
        print(json.dumps(out), flush=True)

    # attention block_q sweep at matcher shapes (B=4 pairs, H=4, N=M=2048, D=64)
    B, H, N, D = 4, 4, 2048, 64
    q = jnp.asarray(rng.normal(size=(B, H, N, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, H, N, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, H, N, D)), jnp.bfloat16)
    mask = jnp.ones((B, N), bool)
    for blk in (128, 256, 512, 1024):
        def att_fn(c, q, k, v, blk=blk):
            o = fused_attention(q + (c * 1e-12).astype(q.dtype), k, v, mask,
                                block_q=blk)
            return o.astype(jnp.float32).sum() * 1e-12

        t = chain_time(att_fn, (q, k, v), n=50)
        out[f"attn_blk{blk}_us"] = round(1e6 * t, 1)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
