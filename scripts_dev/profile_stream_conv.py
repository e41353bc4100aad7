"""Streaming (scratch-free) Pallas conv: 9 per-tap rank-3 dots fed DIRECTLY
by ref loads (no cat/P scratch round-trips) — the formulation closest to
XLA's own streaming conv emitter. Completes the conv-kernel study:
K-folded (8.5ms/img-equiv), N-packed (4x slower), and this.

Shapes: SuperPoint conv1b (8 x 1024^2 x 64 bf16).
"""

import functools
import json
import time

import numpy as np

B, H, W, C = 8, 1024, 1024, 64
ROWS = 8


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

    nck = H // ROWS

    def kernel(x_ref, w_ref, o_ref):
        _, R, Wp, _ = x_ref.shape  # (1, ROWS+2, W+2, C)
        Ro, Wo = R - 2, Wp - 2
        acc = None
        for dy in range(3):
            for dx in range(3):
                part = jax.lax.dot_general(
                    x_ref[0, dy : dy + Ro, dx : dx + Wo, :],
                    w_ref[dy, dx],
                    (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                acc = part if acc is None else acc + part
        o_ref[0] = acc.astype(o_ref.dtype)

    @jax.jit
    def stream_conv(v):
        xp = jnp.pad(v, ((0, 0), (1, 1), (1, 1), (0, 0)))
        starts = jnp.arange(nck) * ROWS
        idx = starts[:, None] + jnp.arange(ROWS + 2)[None, :]
        chunks = xp[:, idx].reshape(B * nck, ROWS + 2, W + 2, C)
        o = pl.pallas_call(
            kernel,
            grid=(B * nck,),
            in_specs=[
                pl.BlockSpec((1, ROWS + 2, W + 2, C), lambda i: (i, 0, 0, 0)),
                pl.BlockSpec((3, 3, C, C), lambda i: (0, 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, ROWS, W, C), lambda i: (i, 0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((B * nck, ROWS, W, C), v.dtype),
        )(chunks, w)
        return o.reshape(B, H, W, C)

    got = stream_conv(x)
    ref = xla_conv(x)
    out["maxdiff"] = float(
        jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32)).max())
    print(json.dumps(out), flush=True)

    def t_st(c, v):
        return stream_conv(v + (c * 1e-12).astype(v.dtype)).astype(
            jnp.float32).sum() * 1e-12

    out["stream_ms"] = round(1000 * chain_time(t_st, (x,)), 3)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
