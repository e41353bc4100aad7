"""Benchmark: SuperPoint + LightGlue end-to-end inference throughput on TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: image pairs/sec/chip for the full two-view pipeline (SuperPoint
extraction on 1024x1024 images + LightGlue matching of 2048 keypoints), the
BASELINE.json north-star.

Methodology: ITERS forward passes are chained inside ONE jitted
`lax.scan` — each iteration consumes a scalar derived from the previous
iteration's output, so XLA cannot hoist or dedupe the loop body, and a single
device round-trip covers the whole measurement (the axon relay's
block_until_ready does not reliably synchronize, and per-iteration host syncs
would measure tunnel RTT instead of device throughput).

Baseline anchor: the LightGlue paper reports ~55 ms/pair for
SuperPoint+LightGlue-full (2048 kpts incl. extraction) on an RTX 3080; an
A100 is ~2x that on inference => ~36 pairs/sec/chip assumed A100 baseline.
"""

from __future__ import annotations

import json
import time

import numpy as np

A100_BASELINE_PAIRS_PER_SEC = 36.0

import os

BATCH = int(os.environ.get("BENCH_BATCH", "4"))
# stacked two-view extraction doubles the conv batch to 2*BATCH images
IMAGE_SIZE = int(os.environ.get("BENCH_IMAGE_SIZE", "1024"))
NUM_KEYPOINTS = int(os.environ.get("BENCH_KEYPOINTS", "2048"))
ITERS = int(os.environ.get("BENCH_ITERS", "50"))
DTYPE = "bfloat16"  # forward compute dtype
# int8 post-training-quantized extraction (ops/int8_conv.py) is available
# (BENCH_QUANTIZE=int8) but measured a WASH on this backend: XLA's conv
# emitter is layout-bound, not MAC-bound, so the int8 MXU's 2x peak does
# not materialize (conv1b shapes: 9.79 ms int8-raw vs 10.38 bf16, 12.4 with
# dynamic-requant epilogues — scripts_dev/profile_int8.py). Kept as a
# serving feature with accuracy bounds pinned by tests/test_int8.py.
QUANTIZE = os.environ.get("BENCH_QUANTIZE", "none")


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
                "quantize": QUANTIZE if QUANTIZE != "none" else None,
            },
            "matcher": {
                "name": "lightglue",
                "n_layers": 9,
                "checkpointed": False,
                # int8 descriptor similarity in the assignment head
                # (BENCH_INT8_SIM=1; measured lever, see ROADMAP perf log)
                "int8_similarity": os.environ.get("BENCH_INT8_SIM", "0") == "1",
            },
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

    # init on a B=1 slice: params are batch-independent, and running the f32
    # init forward at the full bench batch fragments HBM enough that the
    # (smaller!) bf16 measurement program cannot place its temps afterwards —
    # the BENCH_BATCH=8 "OOM" was exactly this (see ROADMAP round-4 perf log)
    batch1 = jax.tree.map(
        lambda x: x[:1] if isinstance(x, jnp.ndarray) else x, batch
    )
    variables = model.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)}, batch1
    )
    if DTYPE == "bfloat16":
        cast = lambda x: (
            x.astype(jnp.bfloat16)
            if isinstance(x, jnp.ndarray) and x.dtype == jnp.float32
            else x
        )
        variables = jax.tree.map(cast, variables)
        batch = jax.tree.map(cast, batch)

    def one_pass(variables, batch, carry):
        b = dict(batch)
        b["view0"] = dict(b["view0"])
        # chain on the previous output so iterations can't be hoisted/deduped
        b["view0"]["image"] = b["view0"]["image"] + (carry * 1e-12).astype(
            b["view0"]["image"].dtype
        )
        out = model.apply(variables, b, rngs={"sample": jax.random.key(2)})
        return out["matching_scores0"].astype(jnp.float32).sum() * 1e-20

    from functools import partial

    @partial(jax.jit, static_argnames=("n",))
    def bench_fn(variables, batch, n):
        def body(carry, _):
            return one_pass(variables, batch, carry), None

        carry, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
        return carry

    # compile (and grab the XLA flop count for the MFU figure: XLA's HLO
    # cost analysis counts a while/scan body ONCE — verified on this
    # backend — so the compiled n=ITERS program reports per-iteration flops)
    compiled = bench_fn.lower(variables, batch, n=ITERS).compile()
    flops = None
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = (float(ca.get("flops", 0.0)) * ITERS) or None
    except Exception:
        flops = None
    float(compiled(variables, batch))

    t0 = time.perf_counter()
    float(compiled(variables, batch))
    dtN = time.perf_counter() - t0

    pairs_per_sec = BATCH * ITERS / dtN  # conservative: includes one tunnel RTT

    V5E_BF16_PEAK_FLOPS = 197e12
    qtag = "int8 extract, bf16 match" if QUANTIZE == "int8" else "bf16"
    result = {
        "metric": (
            f"image pairs/sec/chip (SP+LightGlue, {NUM_KEYPOINTS} kpts, "
            f"{IMAGE_SIZE}px, {qtag})"
        ),
        "value": round(pairs_per_sec, 2),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_sec / A100_BASELINE_PAIRS_PER_SEC, 3),
    }
    if flops:
        result["mfu"] = round(flops / dtN / V5E_BF16_PEAK_FLOPS, 4)
        result["gflops_per_pair"] = round(flops / (BATCH * ITERS) / 1e9, 1)

    try:
        result["pruned"] = bench_pruned(jax, jnp, model, variables, batch)
    except Exception as e:  # the headline metric must survive a pruned failure
        result["pruned"] = {"error": str(e)[:300]}
    print(json.dumps(result))


EXIT_LAYERS = int(os.environ.get("BENCH_EXIT_LAYERS", "5"))


def bench_pruned(jax, jnp, model, variables, batch):
    """Adaptive-pruning serving path (official LightGlue serving defaults
    `depth_confidence: 0.95, width_confidence: 0.99`, reference
    lightglue.py:461-526) measured through the TRUE early-exit
    `lax.while_loop` serving fn (`models/matchers/lightglue_serving.py`).

    With randomly-initialized weights on random images the confidence head
    never fires, so the real data-dependent exit depth is unmeasurable here;
    instead the confidence-head biases are set so every item exits after
    EXIT_LAYERS of the 9 layers (~ the LightGlue paper's average adaptive
    depth on MegaDepth at 0.95). The measurement is therefore the serving
    mechanism's wall-clock at a representative exit depth, extraction
    included, same chained-scan methodology as the headline metric."""
    from gluefactory_tpu.models import get_model
    from gluefactory_tpu.models.matchers.lightglue_serving import make_serving_fn

    lg = get_model("lightglue").from_conf(
        {
            "n_layers": 9,
            "checkpointed": False,
            "flash": True,
            "depth_confidence": 0.95,
            "width_confidence": 0.99,
        }
    )
    # the pipeline's inference init never creates the confidence heads
    # (depth_confidence -1); init the serving matcher on a feature stub so
    # ALL heads exist, then bias them so the batch exits after EXIT_LAYERS
    rng0 = np.random.default_rng(1)
    size = jnp.tile(
        jnp.asarray([[float(IMAGE_SIZE)] * 2], jnp.float32), (BATCH, 1)
    )
    stub = {
        "keypoints0": jnp.asarray(
            rng0.uniform(0, IMAGE_SIZE, (BATCH, NUM_KEYPOINTS, 2)), jnp.float32
        ),
        "keypoints1": jnp.asarray(
            rng0.uniform(0, IMAGE_SIZE, (BATCH, NUM_KEYPOINTS, 2)), jnp.float32
        ),
        "descriptors0": jnp.asarray(
            rng0.normal(size=(BATCH, NUM_KEYPOINTS, 256)), jnp.float32
        ),
        "descriptors1": jnp.asarray(
            rng0.normal(size=(BATCH, NUM_KEYPOINTS, 256)), jnp.float32
        ),
        "view0": {"image_size": size},
        "view1": {"image_size": size},
    }
    lgvars = lg.init({"params": jax.random.key(3)}, stub)
    if DTYPE == "bfloat16":
        lgvars = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if isinstance(x, jnp.ndarray) and x.dtype == jnp.float32
            else x,
            lgvars,
        )
    def forced_exit_params(exit_layers: int) -> dict:
        """Bias the confidence heads so every item exits after
        `exit_layers` of the 9 layers."""
        mparams = dict(lgvars["params"])
        for i in range(8):
            tc = dict(mparams[f"token_confidence_{i}"])
            tok = dict(tc["token"])
            bias = 20.0 if i >= exit_layers - 1 else -20.0
            tok["bias"] = jnp.full_like(tok["bias"], bias)
            tok["kernel"] = jnp.zeros_like(tok["kernel"])
            tc["token"] = tok
            mparams[f"token_confidence_{i}"] = tc
        return mparams

    # extractor-only pipeline (no matcher) produces the suffixed features
    extract = get_model("two_view_pipeline").from_conf(
        {
            "extractor": {
                "name": "superpoint",
                "max_num_keypoints": NUM_KEYPOINTS,
                "detection_threshold": 0.0,
                "force_num_keypoints": True,
                "trainable": False,
                "quantize": QUANTIZE if QUANTIZE != "none" else None,
            },
        }
    )
    evars = {"params": {"extractor_model": variables["params"]["extractor_model"]}}

    from functools import partial

    # the matcher params are a jit ARGUMENT (not closure constants), so ONE
    # compiled program serves every forced exit depth — the while_loop's
    # data-dependent trip count is what varies between sweep points
    @partial(jax.jit, static_argnames=("n",))
    def bench_fn(mparams, batch, n):
        serving_fn = make_serving_fn(lg, {"params": mparams})

        def body(carry, _):
            b = dict(batch)
            b["view0"] = dict(b["view0"])
            b["view0"]["image"] = b["view0"]["image"] + (carry * 1e-12).astype(
                b["view0"]["image"].dtype
            )
            feats = extract.apply(evars, b, rngs={"sample": jax.random.key(2)})
            out = serving_fn({**b, **feats})
            return (
                out["matching_scores0"].astype(jnp.float32).sum() * 1e-20,
                out["exit_layer"],
            )

        carry, exits = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
        return carry, exits[-1]

    mparams0 = forced_exit_params(EXIT_LAYERS)
    compiled = bench_fn.lower(mparams0, batch, n=ITERS).compile()

    def measure(mparams):
        _, exits = compiled(mparams, batch)  # warm + fetch realized exits
        exits = np.asarray(exits)
        t0 = time.perf_counter()
        carry, _ = compiled(mparams, batch)
        float(carry)
        dtN = time.perf_counter() - t0
        return BATCH * ITERS / dtN, int(exits.max()) + 1

    pairs_per_sec, realized = measure(mparams0)

    # pairs/s-vs-exit-depth curve (one compile, varying trip counts)
    sweep = []
    for k in (3, 5, 7, 9):
        pps, depth = measure(forced_exit_params(k))
        sweep.append({"exit_layers": depth, "pairs_per_sec": round(pps, 2)})

    return {
        "pairs_per_sec": round(pairs_per_sec, 2),
        "vs_baseline": round(pairs_per_sec / A100_BASELINE_PAIRS_PER_SEC, 3),
        "exit_layers": realized,
        "depth_confidence": 0.95,
        "width_confidence": 0.99,
        "sweep": sweep,
        "note": (
            "true early-exit while_loop serving path; exit depth forced to "
            f"{EXIT_LAYERS}/9 via confidence-head bias (random-init weights "
            "never exit on random inputs; width pruning is mask-inert); "
            "`sweep` is the pairs/s-vs-exit-depth curve at 3/5/7/9 layers"
        ),
    }


if __name__ == "__main__":
    main()
