"""Execute the B=8-pairs bench program with minimal allocation churn.

bench.py inits the model AT the bench batch (16 f32 images through the
forward) before casting to bf16 — hypothesis: that churn fragments HBM so
the 8.2-GiB measured program (scripts_dev/profile_mem_b8.py) cannot place
its temps, despite a fresh process fitting a single 12-GiB buffer. Here
params are initialized at B=1 and the batch is created bf16 from the start.

Run as `python -m scripts_dev.profile_b8_clean` with the TPU free.
"""

import json
import time
from functools import partial

import numpy as np

BATCH = 8
IMAGE_SIZE = 1024
NUM_KEYPOINTS = 2048
ITERS = 30


def main():
    import jax
    import jax.numpy as jnp

    from gluefactory_tpu.models import get_model

    model = get_model("two_view_pipeline").from_conf(
        {
            "extractor": {
                "name": "superpoint",
                "max_num_keypoints": NUM_KEYPOINTS,
                "detection_threshold": 0.0,
                "force_num_keypoints": True,
                "trainable": False,
            },
            "matcher": {"name": "lightglue", "n_layers": 9, "checkpointed": False},
        }
    )

    rng = np.random.default_rng(0)

    def make_batch(b):
        size = jnp.tile(
            jnp.asarray([[float(IMAGE_SIZE)] * 2], jnp.float32), (b, 1)
        )
        return {
            f"view{i}": {
                "image": jnp.asarray(
                    rng.uniform(0, 1, (b, IMAGE_SIZE, IMAGE_SIZE, 1)), jnp.bfloat16
                ),
                "image_size": size,
            }
            for i in (0, 1)
        }

    # init on a B=1 batch: params are batch-independent, churn is ~1/8
    variables = model.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)}, make_batch(1)
    )
    variables = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if isinstance(x, jnp.ndarray) and x.dtype == jnp.float32
        else x,
        variables,
    )
    batch = make_batch(BATCH)

    def one_pass(variables, batch, carry):
        b = dict(batch)
        b["view0"] = dict(b["view0"])
        b["view0"]["image"] = b["view0"]["image"] + (carry * 1e-12).astype(
            b["view0"]["image"].dtype
        )
        out = model.apply(variables, b, rngs={"sample": jax.random.key(2)})
        return out["matching_scores0"].astype(jnp.float32).sum() * 1e-20

    @partial(jax.jit, static_argnames=("n",))
    def bench_fn(variables, batch, n):
        def body(carry, _):
            return one_pass(variables, batch, carry), None

        carry, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
        return carry

    compiled = bench_fn.lower(variables, batch, n=ITERS).compile()
    float(compiled(variables, batch))
    t0 = time.perf_counter()
    float(compiled(variables, batch))
    dtN = time.perf_counter() - t0
    print(json.dumps({"batch": BATCH, "pairs_per_sec": round(BATCH * ITERS / dtN, 2)}))


if __name__ == "__main__":
    main()
