"""Where does the B=8-pairs (16-image) bench program run out of HBM?

The r3 batch-16 attempt hit RESOURCE_EXHAUSTED at execution even after the
bf16-leak fix; this compiles the same program (no execution) and prints
XLA's memory_analysis so the blocking allocation can be named, then
compiles extraction-only and matcher-only variants to locate it.

Run as `python -m scripts_dev.profile_mem_b8` with the TPU free.
"""

import json

import numpy as np

BATCH = 8
IMAGE_SIZE = 1024
NUM_KEYPOINTS = 2048
ITERS = 2  # scan length does not change live-memory peaks


def mem(compiled):
    try:
        ma = compiled.memory_analysis()
        gb = 1024**3
        return {
            "argument_gib": round(ma.argument_size_in_bytes / gb, 3),
            "output_gib": round(ma.output_size_in_bytes / gb, 3),
            "temp_gib": round(ma.temp_size_in_bytes / gb, 3),
            "generated_code_gib": round(ma.generated_code_size_in_bytes / gb, 3),
            "total_gib": round(
                (
                    ma.argument_size_in_bytes
                    + ma.output_size_in_bytes
                    + ma.temp_size_in_bytes
                    + ma.generated_code_size_in_bytes
                )
                / gb,
                3,
            ),
        }
    except Exception as e:
        return {"error": str(e)[:200]}


def main():
    import jax
    import jax.numpy as jnp

    from functools import partial

    from gluefactory_tpu.models import get_model

    rng = np.random.default_rng(0)
    size = jnp.tile(
        jnp.asarray([[float(IMAGE_SIZE)] * 2], jnp.float32), (BATCH, 1)
    )
    batch = {
        "view0": {
            "image": jnp.asarray(
                rng.uniform(0, 1, (BATCH, IMAGE_SIZE, IMAGE_SIZE, 1)), jnp.bfloat16
            ),
            "image_size": size,
        },
        "view1": {
            "image": jnp.asarray(
                rng.uniform(0, 1, (BATCH, IMAGE_SIZE, IMAGE_SIZE, 1)), jnp.bfloat16
            ),
            "image_size": size,
        },
    }

    def bench_program(model, variables, batch):
        @partial(jax.jit, static_argnames=("n",))
        def bench_fn(variables, batch, n):
            def body(carry, _):
                b = dict(batch)
                b["view0"] = dict(b["view0"])
                b["view0"]["image"] = b["view0"]["image"] + (carry * 1e-12).astype(
                    b["view0"]["image"].dtype
                )
                out = model.apply(variables, b, rngs={"sample": jax.random.key(2)})
                key = (
                    "matching_scores0"
                    if "matching_scores0" in out
                    else "keypoint_scores0"
                )
                return out[key].astype(jnp.float32).sum() * 1e-20, None

            carry, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
            return carry

        return bench_fn.lower(variables, batch, n=ITERS).compile()

    cast16 = lambda t: jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if isinstance(x, jnp.ndarray) and x.dtype == jnp.float32
        else x,
        t,
    )

    report = {}

    # extraction-only
    extract = get_model("two_view_pipeline").from_conf(
        {
            "extractor": {
                "name": "superpoint",
                "max_num_keypoints": NUM_KEYPOINTS,
                "detection_threshold": 0.0,
                "force_num_keypoints": True,
                "trainable": False,
            }
        }
    )
    evars = cast16(
        extract.init({"params": jax.random.key(0), "sample": jax.random.key(1)}, batch)
    )
    report["extract_only_b8"] = mem(bench_program(extract, evars, batch))

    # full pipeline
    full = get_model("two_view_pipeline").from_conf(
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
    fvars = cast16(
        full.init({"params": jax.random.key(0), "sample": jax.random.key(1)}, batch)
    )
    report["full_b8"] = mem(bench_program(full, fvars, batch))

    print(json.dumps(report))


if __name__ == "__main__":
    main()
