"""Matcher-side profile: LightGlue layer scaling + attention kernel share.

Times LightGlue at n_layers in {1, 5, 9} with flash on/off, plus raw mha /
bidirectional_attention at matcher shapes, to locate the 4.4 ms/pair.

Run as `python -m scripts_dev.profile_matcher` with the TPU free.
"""

import json
import time
from functools import partial

import numpy as np

B, K, D = 4, 2048, 256
HEADS, DH = 4, 64


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

    rng = np.random.default_rng(0)
    out = {}

    def feats():
        d = {}
        for v in (0, 1):
            d[f"keypoints{v}"] = jnp.asarray(
                rng.uniform(24, 1000, (B, K, 2)), jnp.bfloat16
            )
            d[f"descriptors{v}"] = jnp.asarray(
                rng.normal(0, 1, (B, K, D)), jnp.bfloat16
            )
            d[f"keypoint_mask{v}"] = jnp.ones((B, K), bool)
            d[f"view{v}"] = {
                "image_size": jnp.tile(
                    jnp.asarray([[1024.0, 1024.0]], jnp.float32), (B, 1)
                )
            }
        return d

    data = feats()
    for n_layers in (1, 5, 9):
        for flash in (True, False):
            m = get_model("lightglue").from_conf(
                {
                    "n_layers": n_layers,
                    "checkpointed": False,
                    "flash": flash,
                    "input_dim": D,
                }
            )
            v = m.init({"params": jax.random.key(0)}, data)
            v = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if hasattr(x, "dtype") and x.dtype == jnp.float32
                else x,
                v,
            )

            def run1(c, v, data):
                d2 = dict(data)
                d2["descriptors0"] = data["descriptors0"] + (c * 1e-12).astype(
                    data["descriptors0"].dtype
                )
                o = m.apply(v, d2)
                return o["matching_scores0"].astype(jnp.float32).sum() * 1e-20

            t = chain_time(run1, (v, data))
            out[f"lg{n_layers}_flash{int(flash)}_ms_per_pair"] = round(
                t / B * 1e3, 3
            )

    # raw attention ops at matcher shapes (self-attn runs views stacked: 2B)
    from gluefactory_tpu.ops.attention import bidirectional_attention, mha

    q = jnp.asarray(rng.normal(0, 1, (2 * B, HEADS, K, DH)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(0, 1, (2 * B, HEADS, K, DH)), jnp.bfloat16)
    vv = jnp.asarray(rng.normal(0, 1, (2 * B, HEADS, K, DH)), jnp.bfloat16)
    mask = jnp.ones((2 * B, K), bool)

    for flash in (True, False):
        def selfattn(c, q, k, vv):
            qq = q + (c * 1e-12).astype(q.dtype)
            return (
                mha(qq, k, vv, mask_q=mask, mask_k=mask, flash=flash)
                .astype(jnp.float32)
                .sum()
                * 1e-20
            )

        out[f"self_mha_flash{int(flash)}_ms_per_pair"] = round(
            chain_time(selfattn, (q, k, vv)) / B * 1e3, 3
        )

        def crossattn(c, q, k, vv):
            qq = q[:B] + (c * 1e-12).astype(q.dtype)
            m0, m1 = bidirectional_attention(
                qq, k[B:], vv[:B], vv[B:], mask[:B], mask[B:], flash=flash
            )
            return (m0.astype(jnp.float32).sum() + m1.astype(jnp.float32).sum()) * 1e-20

        out[f"cross_bidir_flash{int(flash)}_ms_per_pair"] = round(
            chain_time(crossattn, (q, k, vv)) / B * 1e3, 3
        )

    print(json.dumps(out))


if __name__ == "__main__":
    main()
