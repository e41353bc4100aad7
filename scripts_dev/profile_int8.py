"""int8 extraction experiment: does XLA's int8 conv path (MXU 394 TOPS on
v5e, 2x bf16) win end-to-end for the SuperPoint backbone once the
dequant->relu->requant epilogues are paid?

Measures at conv1b shape (8 x 1024^2 x 64):
  1. bf16 conv (baseline)
  2. raw int8 conv -> int32 (upper bound: no epilogue)
  3. int8 conv + per-channel dequant + bias + relu + dynamic requant
     (the realistic per-layer unit)
and the full dense backbone bf16 vs int8-quantized.

Standalone measurement — not wired into any model.
"""

import functools
import json
import time

import numpy as np

B, H, W, C = 8, 1024, 1024, 64


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

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 0.5, (B, H, W, C)), jnp.float32)
    w = jnp.asarray(rng.normal(0, 0.05, (3, 3, C, C)), jnp.float32)
    b = jnp.asarray(rng.normal(0, 0.01, (C,)), jnp.float32)

    x8 = jnp.clip(jnp.round(x / 0.01), -127, 127).astype(jnp.int8)
    # per-out-channel symmetric weight scales
    s_w = jnp.max(jnp.abs(w), axis=(0, 1, 2)) / 127.0
    w8 = jnp.clip(jnp.round(w / s_w), -127, 127).astype(jnp.int8)
    xb = x.astype(jnp.bfloat16)
    wb = w.astype(jnp.bfloat16)

    def conv(v, k, **kw):
        return jax.lax.conv_general_dilated(
            v, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"), **kw
        )

    out = {}

    def t_bf16(c, v):
        return (
            conv(v + (c * 1e-6).astype(v.dtype), wb).astype(jnp.float32).sum()
            * 1e-12
        )

    out["conv_bf16_ms"] = chain_time(t_bf16, (xb,)) * 1e3

    def t_int8_raw(c, v):
        vv = v + (c * 0).astype(v.dtype)
        acc = conv(vv, w8, preferred_element_type=jnp.int32)
        return acc.sum().astype(jnp.float32) * 1e-12

    out["conv_int8_raw_ms"] = chain_time(t_int8_raw, (x8,)) * 1e3

    def t_int8_full(c, v):
        vv = v + (c * 0).astype(v.dtype)
        acc = conv(vv, w8, preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * (s_w * 0.01)[None, None, None] + b
        y = jnp.maximum(y, 0.0).astype(jnp.bfloat16)
        # dynamic per-tensor requant for the next layer
        s = jnp.maximum(jnp.max(jnp.abs(y)).astype(jnp.float32), 1e-8) / 127.0
        y8 = jnp.clip(jnp.round(y.astype(jnp.float32) / s), -127, 127).astype(
            jnp.int8
        )
        return y8.sum(dtype=jnp.int32).astype(jnp.float32) * 1e-12

    out["conv_int8_epilogue_ms"] = chain_time(t_int8_full, (x8,)) * 1e3

    # int8 conv with STATIC requant scale (epilogue fusable, no global max)
    def t_int8_static(c, v):
        vv = v + (c * 0).astype(v.dtype)
        acc = conv(vv, w8, preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * (s_w * 0.01)[None, None, None] + b
        y = jnp.maximum(y, 0.0)
        y8 = jnp.clip(jnp.round(y * (1.0 / 0.02)), -127, 127).astype(jnp.int8)
        return y8.sum(dtype=jnp.int32).astype(jnp.float32) * 1e-12

    out["conv_int8_static_requant_ms"] = chain_time(t_int8_static, (x8,)) * 1e3

    print(json.dumps({k: round(v, 3) for k, v in out.items()}))


if __name__ == "__main__":
    main()
