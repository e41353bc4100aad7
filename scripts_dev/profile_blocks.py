"""Re-sweep the fused attention kernel's q-block size under genuine bf16.

The 512 default was tuned while two silent f32 upcasts (rotary tables,
sampled descriptors — ROADMAP round-4 perf log) made the kernel's operands
f32; with bf16 operands the VMEM footprint halves, so larger blocks fit.

Run as `python -m scripts_dev.profile_blocks` with the TPU free.
"""

import json
import time
from functools import partial

import numpy as np

B, H, K, D = 8, 4, 2048, 64  # self-attn runs both views stacked: 2*pairs


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


def main():
    import jax
    import jax.numpy as jnp

    from gluefactory_tpu.ops.pallas_attention import (
        fused_attention,
        fused_bidirectional_attention,
    )

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(0, 1, (B, H, K, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(0, 1, (B, H, K, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(0, 1, (B, H, K, D)), jnp.bfloat16)
    mask = jnp.ones((B, K), bool)

    out = {}
    for blk in (128, 256, 512, 1024, 2048):
        def selfattn(c, q, k, v):
            qq = q + (c * 1e-12).astype(q.dtype)
            o = fused_attention(qq, k, v, mask, block_q=blk)
            return o.astype(jnp.float32).sum() * 1e-20

        try:
            out[f"self_blk{blk}_us"] = round(chain_time(selfattn, (q, k, v)) * 1e6, 1)
        except Exception as e:
            out[f"self_blk{blk}_us"] = f"ERR {str(e)[:80]}"

        def crossattn(c, q, k, v):
            qq = q[: B // 2] + (c * 1e-12).astype(q.dtype)
            m0, m1 = fused_bidirectional_attention(
                qq, k[B // 2 :], v[: B // 2], v[B // 2 :],
                mask[: B // 2], mask[B // 2 :], block_q=blk,
            )
            return (m0.astype(jnp.float32).sum() + m1.astype(jnp.float32).sum()) * 1e-20

        try:
            out[f"cross_blk{blk}_us"] = round(chain_time(crossattn, (q, k, v)) * 1e6, 1)
        except Exception as e:
            out[f"cross_blk{blk}_us"] = f"ERR {str(e)[:80]}"

    print(json.dumps(out))


if __name__ == "__main__":
    main()
