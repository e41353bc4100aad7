"""LightGlue early-exit serving path: TRUE wall-clock adaptive depth pruning.

The in-model pruned path (`lightglue.py` `_pruned_forward`, reference
`lightglue.py:461-526`) is a masked static-shape realization: exact outputs,
but it always executes all `n_layers` — masking prunes the *assignment*, not
the *time*. This module restructures the identical computation as a
`lax.while_loop` over STACKED per-layer parameters, so a batch whose items
all exit at layer k pays only k layers of transformer compute:

  - per-layer transformer / token-confidence / matchability params are
    stacked along a leading layer axis and indexed inside the loop body
    (one program, data-dependent trip count — XLA executes only the
    iterations that run);
  - the depth-exit rule, width keep-rule, prune counters and mask freezing
    replicate `_pruned_forward` bit-for-bit (parity-tested in
    tests/test_serving.py), so outputs equal the parity-tested masked path;
  - the final (M+1)x(N+1) log-assignment is computed ONCE per item at that
    item's own exit layer (vmapped parameter gather), not per layer.

Width pruning stays mask-based inside the loop (a gather-compaction to a
smaller static shape would need shape buckets and re-compiles; masking keeps
one compiled program). Depth is where the reference's own headline speedup
lives; the serving benchmark (`bench.py` pruned line) measures it.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ...ops.assignment import filter_matches
from .lightglue import (
    LearnableFourierPosEnc,
    MatchAssignment,
    TokenConfidence,
    TransformerLayer,
    normalize_keypoints,
)


def stack_layer_params(params: dict, prefix: str, n: int):
    """Stack params of `{prefix}_0..{prefix}_{n-1}` along a new leading axis."""
    per_layer = [params[f"{prefix}_{i}"] for i in range(n)]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *per_layer)


def make_serving_fn(model, variables):
    """Build a jittable `fn(data) -> pred` running the early-exit serving
    path of `model` (a LightGlue instance) with `variables`.

    `model.conf.depth_confidence` must be > 0 (otherwise there is no exit
    rule and the plain forward is the right path)."""
    c = model.conf
    n = int(c.n_layers)
    assert c.depth_confidence > 0, "serving path needs depth_confidence > 0"
    params = variables["params"]
    head_dim = c.descriptor_dim // c.num_heads

    tf_stack = stack_layer_params(params, "transformers", n)
    as_stack = stack_layer_params(params, "log_assignment", n)
    conf_stack = stack_layer_params(params, "token_confidence", n - 1)

    layer = TransformerLayer(c.descriptor_dim, c.num_heads, bool(c.flash))
    assign = MatchAssignment(
        c.descriptor_dim, int8_sim=bool(c.get("int8_similarity", False))
    )
    tokconf = TokenConfidence()
    def input_proj(x):
        p = params["input_proj"]
        return x @ p["kernel"] + p["bias"]
    # per-layer confidence thresholds (reference lightglue.py:540-544)
    thresholds = jnp.asarray(
        [min(0.8 + 0.1 * math.exp(-4.0 * i / n), 1.0) for i in range(n)],
        jnp.float32,
    )
    depth_conf = float(c.depth_confidence)
    width_conf = float(c.width_confidence)

    def fn(data: dict) -> dict:
        kpts0, kpts1 = data["keypoints0"], data["keypoints1"]
        mask0 = data.get("keypoint_mask0")
        mask1 = data.get("keypoint_mask1")
        size0 = data["view0"]["image_size"] if "view0" in data else data["image_size0"]
        size1 = data["view1"]["image_size"] if "view1" in data else data["image_size1"]
        p0 = normalize_keypoints(kpts0, size0)
        p1 = normalize_keypoints(kpts1, size1)
        if c.add_scale_ori:
            p0 = jnp.concatenate(
                [p0, data["scales0"][..., None], data["oris0"][..., None]], axis=-1
            )
            p1 = jnp.concatenate(
                [p1, data["scales1"][..., None], data["oris1"][..., None]], axis=-1
            )
        desc0 = input_proj(data["descriptors0"])
        desc1 = input_proj(data["descriptors1"])
        posenc = LearnableFourierPosEnc(head_dim)
        enc0 = posenc.apply({"params": params["posenc"]}, p0)
        enc1 = posenc.apply({"params": params["posenc"]}, p1)

        B, M, _ = desc0.shape
        N = desc1.shape[1]
        active0 = mask0 if mask0 is not None else jnp.ones((B, M), bool)
        active1 = mask1 if mask1 is not None else jnp.ones((B, N), bool)

        min_kpts = model.pruning_min_kpts()
        if max(M, N) < min_kpts:
            # pruning loses time on small problems (reference
            # lightglue.py:572-576 device guard): run the dense program —
            # static shapes make this a trace-time decision
            d0, d1 = desc0, desc1
            for i in range(n):
                tp = jax.tree.map(lambda x, i=i: x[i], tf_stack)
                d0, d1 = layer.apply(
                    {"params": tp}, d0, d1, enc0, enc1, active0, active1
                )
            ap = jax.tree.map(lambda x: x[n - 1], as_stack)
            scores, _, _, _ = assign.apply(
                {"params": ap}, d0, d1, active0, active1
            )
            m0, m1, mscores0, mscores1 = filter_matches(
                scores, c.filter_threshold, mask0, mask1
            )
            return {
                "log_assignment": scores,
                "matches0": m0,
                "matches1": m1,
                "matching_scores0": mscores0,
                "matching_scores1": mscores1,
                "prune0": jnp.full((B, M), n, jnp.int32),
                "prune1": jnp.full((B, N), n, jnp.int32),
                "exit_layer": jnp.full((B,), n - 1, jnp.int32),
            }
        prune0 = jnp.ones((B, M), jnp.int32)
        prune1 = jnp.ones((B, N), jnp.int32)
        stopped = jnp.zeros((B,), bool)
        exit_layer = jnp.full((B,), n - 1, jnp.int32)

        # the while_loop carry must be dtype-stable, but a layer may upcast
        # (e.g. bf16 descriptors through the f32-accumulating attention
        # path): seed the carry with the layer's OUTPUT dtype so serving
        # matches the dense program's numerics at every input dtype
        tp0 = jax.tree.map(lambda x: x[0], tf_stack)
        out_sd = jax.eval_shape(
            lambda d0, d1: layer.apply(
                {"params": tp0}, d0, d1, enc0, enc1, active0, active1
            ),
            desc0,
            desc1,
        )
        desc0 = desc0.astype(out_sd[0].dtype)
        desc1 = desc1.astype(out_sd[1].dtype)

        state = (0, desc0, desc1, active0, active1, stopped, exit_layer, prune0, prune1)

        def cond(state):
            i, stopped = state[0], state[5]
            return (i < n) & ~jnp.all(stopped)

        def body(state):
            i, desc0, desc1, active0, active1, stopped, exit_layer, prune0, prune1 = state
            tp = jax.tree.map(lambda x: x[i], tf_stack)
            nd0, nd1 = layer.apply(
                {"params": tp}, desc0, desc1, enc0, enc1, active0, active1
            )
            desc0 = jnp.where(stopped[:, None, None], desc0, nd0)
            desc1 = jnp.where(stopped[:, None, None], desc1, nd1)

            last = i == n - 1
            conf_th = thresholds[i]
            cp = jax.tree.map(lambda x: x[jnp.minimum(i, n - 2)], conf_stack)
            c0, c1 = tokconf.apply({"params": cp}, desc0, desc1)
            confident0 = (c0 >= conf_th) | ~active0
            confident1 = (c1 >= conf_th) | ~active1
            num = jnp.maximum(active0.sum(-1) + active1.sum(-1), 1).astype(jnp.float32)
            ratio = (
                (confident0 & active0).sum(-1) + (confident1 & active1).sum(-1)
            ).astype(jnp.float32) / num
            # forced exit at the last layer; depth rule otherwise
            stop_now = jnp.where(last, ~stopped, (ratio > depth_conf) & ~stopped)
            exit_layer = jnp.where(stop_now, i, exit_layer)
            stopped = stopped | stop_now

            if width_conf > 0:
                ap = jax.tree.map(lambda x: x[i], as_stack)
                z0 = assign.apply({"params": ap}, desc0, method="get_matchability")
                z1 = assign.apply({"params": ap}, desc1, method="get_matchability")
                keep0 = jax.nn.sigmoid(z0) > (1.0 - width_conf)
                keep1 = jax.nn.sigmoid(z1) > (1.0 - width_conf)
                # low-confidence points are never width-pruned
                keep0 = keep0 | (c0 <= conf_th)
                keep1 = keep1 | (c1 <= conf_th)
                new_active0 = active0 & jnp.where(stopped[:, None], active0, keep0)
                new_active1 = active1 & jnp.where(stopped[:, None], active1, keep1)
                upd0 = new_active0 & ~stopped[:, None]
                upd1 = new_active1 & ~stopped[:, None]
                # no width round after the forced last-layer exit
                active0 = jnp.where(last, active0, new_active0)
                active1 = jnp.where(last, active1, new_active1)
                prune0 = prune0 + jnp.where(last, 0, upd0)
                prune1 = prune1 + jnp.where(last, 0, upd1)

            return (
                i + 1, desc0, desc1, active0, active1, stopped, exit_layer,
                prune0, prune1,
            )

        (_, desc0, desc1, active0, active1, _, exit_layer, prune0, prune1) = (
            jax.lax.while_loop(cond, body, state)
        )

        # final assignment at each item's own exit layer (reference computes
        # it on the exit iteration; here: vmapped per-item parameter gather)
        ap_item = jax.tree.map(lambda x: x[exit_layer], as_stack)

        def per_item(pl, d0, d1, a0, a1):
            scores, _, _, _ = assign.apply(
                {"params": pl}, d0[None], d1[None], a0[None], a1[None]
            )
            return scores[0]

        scores = jax.vmap(per_item)(ap_item, desc0, desc1, active0, active1)
        if not width_conf > 0:
            prune0 = jnp.full((B, M), n, jnp.int32)
            prune1 = jnp.full((B, N), n, jnp.int32)

        m0, m1, mscores0, mscores1 = filter_matches(
            scores, c.filter_threshold, mask0, mask1
        )
        return {
            "log_assignment": scores,
            "matches0": m0,
            "matches1": m1,
            "matching_scores0": mscores0,
            "matching_scores1": mscores1,
            "prune0": prune0,
            "prune1": prune1,
            "exit_layer": exit_layer,
        }

    return fn
