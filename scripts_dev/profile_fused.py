"""Measure the fused Pallas extraction paths on the real TPU.

Times SuperPoint extract (2B images of 1024^2, bf16, K=2048) with the
fused detect / fused backbone kernels toggled, and cross-checks numeric
parity on-device. Run alone (one TPU process rule).
"""

import json
import time
from functools import partial

import numpy as np

NB = 16  # images
S = 1024
K = 2048


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
    img = jnp.asarray(rng.uniform(0, 1, (NB, S, S, 1)), jnp.float32).astype(
        jnp.bfloat16)
    size = jnp.tile(jnp.asarray([[S, S]], jnp.float32), (NB, 1))
    out = {}
    preds = {}

    variables = None
    for fd, fb in ((False, False), (True, False), (False, True), (True, True)):
        sp = get_model("superpoint").from_conf(
            {"max_num_keypoints": K, "detection_threshold": 0.0,
             "force_num_keypoints": True, "trainable": False,
             "fused_detect": fd, "fused_backbone": fb}
        )
        if variables is None:
            tiny = {"image": jnp.zeros((1, 256, 256, 1), jnp.bfloat16),
                    "image_size": jnp.asarray([[256, 256]], jnp.float32)}
            variables = sp.init(
                {"params": jax.random.key(0), "sample": jax.random.key(1)}, tiny)
            variables = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if x.dtype == jnp.float32 else x, variables)

        def ex(c, im, sp=sp):
            o = sp.apply(variables, {"image": im + (c * 1e-12).astype(im.dtype),
                                     "image_size": size},
                         rngs={"sample": jax.random.key(2)})
            return (o["descriptors"].astype(jnp.float32).sum()
                    + o["keypoints"].sum()) * 1e-12

        t = chain_time(ex, (img,), n=10)
        out[f"extract_fd{int(fd)}_fb{int(fb)}_ms_per_image"] = round(
            1000 * t / NB, 3)
        print(json.dumps(out), flush=True)

        o = jax.jit(lambda im, sp=sp: sp.apply(
            variables, {"image": im, "image_size": size},
            rngs={"sample": jax.random.key(2)}))(img)
        preds[(fd, fb)] = jax.tree.map(np.asarray, o)

    # parity vs (False, False) baseline
    base = preds[(False, False)]
    for key, o in preds.items():
        if key == (False, False):
            continue
        kd = float(np.abs(o["keypoints"] - base["keypoints"]).max())
        dd = float(
            np.abs(o["descriptors"].astype(np.float32)
                   - base["descriptors"].astype(np.float32)).max())
        out[f"parity_{key}"] = {"kpt_max_diff": kd, "desc_max_diff": dd}
    print(json.dumps({k: v for k, v in out.items() if "parity" in str(k)},
                     default=str))


if __name__ == "__main__":
    main()
