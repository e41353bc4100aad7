"""N-packed conv experiment: can a Pallas 3x3 conv beat XLA by packing the
three ROW taps into the matmul's N dim (N=192, 75% MXU columns) instead of
the K-folded N=64 formulation (50% column ceiling)?

out[i] = sum_dy cat[i+dy] @ W[dy]  ==  with P = cat @ [W0|W1|W2] (N=192):
out[i] = P[i, 0:C] + P[i+1, C:2C] + P[i+2, 2C:3C]
(per-dy partials realigned by row offset — ref loads from a P scratch).

Measures XLA conv vs this kernel at SuperPoint conv1b shapes
(8 x 1024^2 x 64, bf16). Standalone — not wired into any model.
"""

import functools
import json
import time

import numpy as np

B, H, W, C = 8, 1024, 1024, 64
ROWS = 4  # per grid chunk


def chain_time(fn, args, n=20):
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("n",))
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 0.5, (B, H, W, C)), jnp.float32).astype(
        jnp.bfloat16)
    w = jnp.asarray(rng.normal(0, 0.05, (3, 3, C, C)), jnp.float32).astype(
        jnp.bfloat16)

    def xla_conv(v):
        return jax.lax.conv_general_dilated(
            v, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    out = {}

    def t_xla(c, v):
        return xla_conv(v + (c * 1e-12).astype(v.dtype)).astype(
            jnp.float32).sum() * 1e-12

    out["xla_ms"] = round(1000 * chain_time(t_xla, (x,)), 3)
    print(json.dumps(out), flush=True)

    # --- N-packed Pallas kernel ---
    # wpack: (3C, 3C): K = dx-folded channels, N = [dy0|dy1|dy2] x C
    wpack = jnp.concatenate(
        [w[dy].reshape(3 * C, C) for dy in range(3)], axis=-1)  # (3C, 3C)

    nck = H // ROWS

    def kernel(x_ref, w_ref, o_ref, cat_ref, p_ref):
        _, R, Wp, _ = x_ref.shape  # (1, ROWS+2, W+2, C)
        Ro, Wo = R - 2, Wp - 2
        for dx in range(3):
            cat_ref[:, :, dx * C : (dx + 1) * C] = x_ref[
                0, :, dx : dx + Wo, :]
        # P over ALL R rows: (R, Wo, 3C)
        p_ref[:] = jax.lax.dot_general(
            cat_ref[:], w_ref[:], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = (
            p_ref[0:Ro, :, 0:C]
            + p_ref[1 : Ro + 1, :, C : 2 * C]
            + p_ref[2 : Ro + 2, :, 2 * C : 3 * C]
        )
        o_ref[0] = acc.astype(o_ref.dtype)

    @jax.jit
    def npack_conv(v):
        xp = jnp.pad(v, ((0, 0), (1, 1), (1, 1), (0, 0)))
        starts = jnp.arange(nck) * ROWS
        idx = starts[:, None] + jnp.arange(ROWS + 2)[None, :]
        chunks = xp[:, idx].reshape(B * nck, ROWS + 2, W + 2, C)
        o = pl.pallas_call(
            kernel,
            grid=(B * nck,),
            in_specs=[
                pl.BlockSpec((1, ROWS + 2, W + 2, C), lambda i: (i, 0, 0, 0)),
                pl.BlockSpec((3 * C, 3 * C), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, ROWS, W, C), lambda i: (i, 0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((B * nck, ROWS, W, C), v.dtype),
            scratch_shapes=[
                pltpu.VMEM((ROWS + 2, W, 3 * C), v.dtype),
                pltpu.VMEM((ROWS + 2, W, 3 * C), jnp.float32),
            ],
        )(chunks, wpack)
        return o.reshape(B, H, W, C)

    got = npack_conv(x)
    ref = xla_conv(x)
    out["maxdiff"] = float(
        jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32)).max())
    print(json.dumps(out), flush=True)

    def t_np(c, v):
        return npack_conv(v + (c * 1e-12).astype(v.dtype)).astype(
            jnp.float32).sum() * 1e-12

    out["npack_ms"] = round(1000 * chain_time(t_np, (x,)), 3)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
