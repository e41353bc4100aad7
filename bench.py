"""Benchmark: SuperPoint + LightGlue end-to-end inference throughput on TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: image pairs/sec/chip for the full two-view pipeline (SuperPoint
extraction on 1024x1024 images + LightGlue matching of 2048 keypoints), the
BASELINE.json north-star. Baseline anchor: the LightGlue paper reports ~55 ms
/pair for SuperPoint+LightGlue-full (2048 kpts incl. extraction) on an RTX
3080; an A100 is ~2x that GPU on inference => ~36 pairs/sec/chip assumed
A100 baseline. vs_baseline = value / 36.0.
"""

from __future__ import annotations

import json
import time

import numpy as np

A100_BASELINE_PAIRS_PER_SEC = 36.0

BATCH = 4
IMAGE_SIZE = 1024
NUM_KEYPOINTS = 2048
WARMUP = 2
ITERS = 10


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
    size = jnp.tile(
        jnp.asarray([[float(IMAGE_SIZE), float(IMAGE_SIZE)]], jnp.float32), (BATCH, 1)
    )
    batch = {
        "view0": {
            "image": jnp.asarray(
                rng.uniform(0, 1, (BATCH, IMAGE_SIZE, IMAGE_SIZE, 1)), jnp.float32
            ),
            "image_size": size,
        },
        "view1": {
            "image": jnp.asarray(
                rng.uniform(0, 1, (BATCH, IMAGE_SIZE, IMAGE_SIZE, 1)), jnp.float32
            ),
            "image_size": size,
        },
    }

    variables = model.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)}, batch
    )

    @jax.jit
    def forward(variables, batch):
        return model.apply(variables, batch, rngs={"sample": jax.random.key(2)})

    # warmup / compile
    for _ in range(WARMUP):
        out = forward(variables, batch)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = forward(variables, batch)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    pairs_per_sec = BATCH * ITERS / dt
    print(
        json.dumps(
            {
                "metric": "image pairs/sec/chip (SP+LightGlue, 2048 kpts, 1024px)",
                "value": round(pairs_per_sec, 2),
                "unit": "pairs/s",
                "vs_baseline": round(pairs_per_sec / A100_BASELINE_PAIRS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
