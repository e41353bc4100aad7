"""conv1a (1->64 @ full res) XLA formulations on TPU.

C_in=1 makes the direct conv MXU-hostile (measured 0.75 ms/img, ~1.6 TFLOP/s).
Candidates: space-to-depth by s: conv3x3 stride1 on 1ch  ==  conv k'xk' on
s^2 ch with s^2*64 outputs + depth-to-space, k' = 3//s + 1 taps... exactly:
out[2i+p, 2j+q] depends on x[2i+p+dy-1, 2j+q+dx-1] -> in s2d coords a 2x2
neighborhood of 4-ch pixels for s=2. Equivalent: conv( s2d(x), W' ) with
kernel 2x2 x 4ch x 256out, then d2s. K=16, N=256 instead of K=9, N=64.
"""

import json
import time
from functools import partial

import numpy as np

B, S = 8, 1024


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


def s2d(x, s):
    b, h, w, c = x.shape
    x = x.reshape(b, h // s, s, w // s, s, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // s, w // s, s * s * c)


def d2s(x, s):
    b, h, w, c = x.shape
    cc = c // (s * s)
    x = x.reshape(b, h, w, s, s, cc)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * s, w * s, cc)


def expand_w(w, s):
    """(3,3,1,C) stride-1 SAME kernel -> s2d kernel (k',k',s^2, s^2*C) such
    that conv(s2d(x)) == s2d(conv(x)). Output channel (p,q,c) at s2d pixel
    (I,J) = out[sI+p, sJ+q] = sum_{dy,dx} x[sI+p+dy-1, sJ+q+dx-1] w[dy,dx,c].
    Source pixel in s2d coords: (sI + p + dy - 1) = s*(I+A) + a."""
    import numpy as np

    k = w.shape[0]
    r = k // 2
    # for k=3 (r=1): source offset A = (p + dy - r) // s is always in
    # {-1, 0, 1} for any s >= 1 -> 3 taps in s2d space
    kp = 3
    out = np.zeros((kp, kp, s * s, s * s * w.shape[-1]), w.dtype)
    for p in range(s):
        for q in range(s):
            for dy in range(k):
                for dx in range(k):
                    y, x_ = p + dy - r, q + dx - r
                    A, a = y // s, y % s
                    Bb, bcol = x_ // s, x_ % s
                    # kernel tap index: s2d SAME conv with kp taps has its
                    # center at kp//2; source offset A in [-1, ...]
                    ty, tx = A + kp // 2, Bb + kp // 2
                    cin = a * s + bcol
                    for c in range(w.shape[-1]):
                        cout = (p * s + q) * w.shape[-1] + c
                        out[ty, tx, cin, cout] += w[dy, dx, 0, c]
    return out


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (B, S, S, 1)), jnp.bfloat16)
    w = np.asarray(rng.normal(0, 0.2, (3, 3, 1, 64)), np.float32)
    wj = jnp.asarray(w, jnp.bfloat16)

    def conv(v, wk, pad="SAME"):
        return jax.lax.conv_general_dilated(
            v, wk, (1, 1), pad, dimension_numbers=("NHWC", "HWIO", "NHWC"))

    out = {}

    def direct(c, x):
        return conv(x + (c * 1e-12).astype(x.dtype), wj).astype(
            jnp.float32).sum() * 1e-12

    out["direct_ms"] = round(1000 * chain_time(direct, (x,)), 3)
    print(json.dumps(out), flush=True)

    ref = conv(x, wj)
    for s in (2, 4):
        ws = jnp.asarray(expand_w(w, s), jnp.bfloat16)

        def s2d_conv(c, x, s=s, ws=ws):
            y = conv(s2d(x + (c * 1e-12).astype(x.dtype), s), ws)
            return d2s(y, s).astype(jnp.float32).sum() * 1e-12

        out[f"s2d{s}_ms"] = round(1000 * chain_time(s2d_conv, (x,)), 3)
        got = d2s(conv(s2d(x, s), ws), s)
        out[f"s2d{s}_maxdiff"] = float(
            jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32)).max())
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
