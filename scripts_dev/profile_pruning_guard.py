"""Measure the TPU `pruning_min_kpts` crossover: at which keypoint count does
the early-exit while_loop serving path start beating the dense 9-layer
program? (Role of the reference's device-keyed `pruning_keypoint_thresholds`,
lightglue.py:572-576 — cuda 1024 / flash 1536; here measured for v5e.)

Matcher-only (the guard is a matcher decision), bf16, exit depth forced to
5/9 (the representative adaptive depth), chained-scan timing like bench.py.

Run (claims the TPU — ensure no other python process):
    python scripts_dev/profile_pruning_guard.py
"""

from __future__ import annotations

import json
import time
from functools import partial

import numpy as np

SIZES = (64, 128, 256, 512, 1024, 2048)
ITERS = 50
BATCH = 4
EXIT = 5


def make_inputs(jnp, rng, k):
    size = jnp.tile(jnp.asarray([[1024.0, 1024.0]], jnp.float32), (BATCH, 1))
    return {
        "keypoints0": jnp.asarray(rng.uniform(0, 1024, (BATCH, k, 2)), jnp.float32),
        "keypoints1": jnp.asarray(rng.uniform(0, 1024, (BATCH, k, 2)), jnp.float32),
        "descriptors0": jnp.asarray(rng.normal(size=(BATCH, k, 256)), jnp.bfloat16),
        "descriptors1": jnp.asarray(rng.normal(size=(BATCH, k, 256)), jnp.bfloat16),
        "view0": {"image_size": size},
        "view1": {"image_size": size},
    }


def main():
    import jax
    import jax.numpy as jnp

    from gluefactory_tpu.models import get_model
    from gluefactory_tpu.models.matchers.lightglue_serving import make_serving_fn

    results = []
    for k in SIZES:
        rng = np.random.default_rng(0)
        data = make_inputs(jnp, rng, k)

        lg = get_model("lightglue").from_conf(
            {
                "n_layers": 9,
                "checkpointed": False,
                "flash": True,
                "depth_confidence": 0.95,
                "width_confidence": 0.99,
                "pruning_min_kpts": -1,  # measure both paths at every size
            }
        )
        variables = lg.init({"params": jax.random.key(0)}, data)
        variables = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if isinstance(x, jnp.ndarray) and x.dtype == jnp.float32
            else x,
            variables,
        )
        mparams = dict(variables["params"])
        for i in range(8):
            tc = dict(mparams[f"token_confidence_{i}"])
            tok = dict(tc["token"])
            tok["bias"] = jnp.full_like(tok["bias"], 20.0 if i >= EXIT - 1 else -20.0)
            tok["kernel"] = jnp.zeros_like(tok["kernel"])
            tc["token"] = tok
            mparams[f"token_confidence_{i}"] = tc

        lg_dense = get_model("lightglue").from_conf(
            {"n_layers": 9, "checkpointed": False, "flash": True}
        )

        def time_fn(step):
            @partial(jax.jit, static_argnames=("n",))
            def bench(data, n):
                def body(carry, _):
                    d = dict(data)
                    d["descriptors0"] = d["descriptors0"] + (carry * 1e-12).astype(
                        d["descriptors0"].dtype
                    )
                    return step(d), None

                carry, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
                return carry

            compiled = bench.lower(data, n=ITERS).compile()
            float(compiled(data))  # warm
            t0 = time.perf_counter()
            float(compiled(data))
            dt = time.perf_counter() - t0
            return dt / (BATCH * ITERS) * 1e3  # ms/pair

        serving_fn = make_serving_fn(lg, {"params": mparams})
        ms_serve = time_fn(
            lambda d: serving_fn(d)["matching_scores0"].astype(jnp.float32).sum()
            * 1e-20
        )
        ms_dense = time_fn(
            lambda d: lg_dense.apply({"params": mparams}, d)["matching_scores0"]
            .astype(jnp.float32)
            .sum()
            * 1e-20
        )
        row = {
            "kpts": k,
            "ms_per_pair_serving_exit5": round(ms_serve, 3),
            "ms_per_pair_dense9": round(ms_dense, 3),
            "serving_wins": ms_serve < ms_dense,
        }
        results.append(row)
        print(json.dumps(row), flush=True)
    print(json.dumps({"sweep": results}))


if __name__ == "__main__":
    main()
