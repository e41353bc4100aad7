"""Matcher metrics vs ground truth (reference `models/utils/metrics.py:5-51`).

Per-sample metrics over the `matches0`-style convention (-1 unmatched,
-2 ignore): recall over GT positives, precision/accuracy over predicted /
non-ignored slots, and a ranking "average precision" from the
matching-score ordering.  All formulas reproduce the reference exactly —
including `ranking_ap`'s scaling of the recall increments by the FINAL
precision point only (`metrics.py:32-33`, `p_pts[:, None, -1]`), kept
as-is for numeric parity.

Padding-inert by construction: padded keypoint slots are labelled -2
(ignore) by the GT generators, which zeroes them out of every mask.
"""

from __future__ import annotations

import jax.numpy as jnp


def matcher_metrics(
    pred: dict, data: dict, prefix: str = "", prefix_gt: str | None = None
) -> dict:
    """recall / precision / accuracy / ranking-AP of `{prefix}matches0`
    against `gt_{prefix_gt}matches0` (reference `metrics.py:5-51`)."""

    def recall(m, gt_m):
        mask = (gt_m > -1).astype(jnp.float32)
        return ((m == gt_m) * mask).sum(1) / (1e-8 + mask.sum(1))

    def accuracy(m, gt_m):
        mask = (gt_m >= -1).astype(jnp.float32)
        return ((m == gt_m) * mask).sum(1) / (1e-8 + mask.sum(1))

    def precision(m, gt_m):
        mask = ((m > -1) & (gt_m >= -1)).astype(jnp.float32)
        return ((m == gt_m) * mask).sum(1) / (1e-8 + mask.sum(1))

    def ranking_ap(m, gt_m, scores):
        p_mask = ((m > -1) & (gt_m >= -1)).astype(jnp.float32)
        r_mask = (gt_m > -1).astype(jnp.float32)
        sort_ind = jnp.argsort(-scores, axis=-1)
        sorted_p_mask = jnp.take_along_axis(p_mask, sort_ind, axis=-1)
        sorted_r_mask = jnp.take_along_axis(r_mask, sort_ind, axis=-1)
        sorted_tp = jnp.take_along_axis(m == gt_m, sort_ind, axis=-1)
        p_pts = jnp.cumsum(sorted_tp * sorted_p_mask, -1) / (
            1e-8 + jnp.cumsum(sorted_p_mask, -1)
        )
        r_pts = jnp.cumsum(sorted_tp * sorted_r_mask, -1) / (
            1e-8 + sorted_r_mask.sum(-1)[:, None]
        )
        r_pts_diff = r_pts[..., 1:] - r_pts[..., :-1]
        return jnp.sum(r_pts_diff * p_pts[:, None, -1], axis=-1)

    if prefix_gt is None:
        prefix_gt = prefix
    m0 = pred[f"{prefix}matches0"]
    gt_m0 = data[f"gt_{prefix_gt}matches0"]
    return {
        f"{prefix}match_recall": recall(m0, gt_m0),
        f"{prefix}match_precision": precision(m0, gt_m0),
        f"{prefix}accuracy": accuracy(m0, gt_m0),
        f"{prefix}average_precision": ranking_ap(
            m0, gt_m0, pred[f"{prefix}matching_scores0"]
        ),
    }
