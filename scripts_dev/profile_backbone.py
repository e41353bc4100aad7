"""Per-stage SuperPoint backbone timing on TPU (bf16, NHWC, B images).

Finds where the dense pass loses vs speed-of-light (~1.2 ms/image @1024^2:
HBM-bound conv chain). Stages are timed standalone with the chained-scan
methodology, so inter-stage fusion is NOT captured — treat as upper bounds.
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


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    key = jax.random.key(0)

    def conv(x, cin, cout, k=3):
        w = jnp.asarray(rng.normal(0, 0.05, (k, k, cin, cout)), jnp.bfloat16)
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )

    out = {}

    def stage(name, fn, shape):
        x = jnp.asarray(rng.uniform(0, 1, shape), jnp.bfloat16)

        def f(c, x):
            y = fn(x + (c * 1e-12).astype(x.dtype))
            return y.astype(jnp.float32).sum() * 1e-12

        t = chain_time(f, (x,))
        out[name] = round(1000 * t, 3)
        print(json.dumps({name: out[name]}), flush=True)

    relu = jax.nn.relu
    stage("conv1a_1->64@1024", lambda x: relu(conv(x, 1, 64)), (B, S, S, 1))
    stage("conv1b_64->64@1024", lambda x: relu(conv(x, 64, 64)), (B, S, S, 64))
    stage("pool1@1024", lambda x: -jax.lax.reduce_window(
        -x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"),
        (B, S, S, 64))
    stage("conv2a_64->64@512", lambda x: relu(conv(x, 64, 64)), (B, S // 2, S // 2, 64))
    stage("conv3a_64->128@256", lambda x: relu(conv(x, 64, 128)), (B, S // 4, S // 4, 64))
    stage("conv3b_128->128@256", lambda x: relu(conv(x, 128, 128)), (B, S // 4, S // 4, 128))
    stage("conv4a_128->128@128", lambda x: relu(conv(x, 128, 128)), (B, S // 8, S // 8, 128))
    stage("convPa_128->256@128", lambda x: relu(conv(x, 128, 256)), (B, S // 8, S // 8, 128))
    stage("convPb_256->65@128", lambda x: conv(x, 256, 65, k=1), (B, S // 8, S // 8, 256))
    stage("convDa_128->256@128", lambda x: relu(conv(x, 128, 256)), (B, S // 8, S // 8, 128))
    stage("convDb_256->256@128", lambda x: conv(x, 256, 256, k=1), (B, S // 8, S // 8, 256))

    def softmax_shuffle(logits):
        s = jax.nn.softmax(logits, axis=-1)[..., :64]
        b, hc, wc, _ = s.shape
        s = s.reshape(b, hc, wc, 8, 8).transpose(0, 1, 3, 2, 4)
        return s.reshape(b, hc * 8, wc * 8)

    stage("softmax+shuffle@128", softmax_shuffle, (B, S // 8, S // 8, 65))

    # fused conv1a+conv1b+pool1 chain (what XLA actually schedules together)
    def chain1(x):
        y = relu(conv(x, 1, 64))
        y = relu(conv(y, 64, 64))
        return -jax.lax.reduce_window(
            -y, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")

    stage("block1_total@1024", chain1, (B, S, S, 1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
