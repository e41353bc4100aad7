"""Dense descriptor nearest-neighbor matcher.

Role of reference `models/matchers/nearest_neighbor_matcher.py:38-97`:
cosine-similarity einsum, optional ratio/distance thresholds, mutual check,
dual-softmax matching scores; optional trainable N-pair contrastive loss with
a learned temperature.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.assignment import NEG_INF, find_nn, mutual_check
from ..base_model import BaseModel


class NearestNeighborMatcher(BaseModel):
    default_conf = {
        "ratio_thresh": None,
        "distance_thresh": None,
        "mutual_check": True,
        "loss": None,  # None | "N_pair"
    }
    required_data_keys = ["descriptors0", "descriptors1"]

    def setup(self):
        if self.conf.loss == "N_pair":
            self.temperature = self.param("temperature", lambda k: jnp.asarray(1.0))

    def _forward(self, data: dict, train: bool = False) -> dict:
        d0, d1 = data["descriptors0"], data["descriptors1"]
        mask0 = data.get("keypoint_mask0")
        mask1 = data.get("keypoint_mask1")
        sim = jnp.einsum("bnd,bmd->bnm", d0, d1)
        if mask0 is not None:
            sim = jnp.where(mask0[..., :, None], sim, NEG_INF)
        if mask1 is not None:
            sim = jnp.where(mask1[..., None, :], sim, NEG_INF)
        matches0, scores0 = find_nn(sim, self.conf.ratio_thresh, self.conf.distance_thresh)
        matches1, scores1 = find_nn(
            jnp.swapaxes(sim, 1, 2), self.conf.ratio_thresh, self.conf.distance_thresh
        )
        if self.conf.mutual_check:
            matches0 = mutual_check(matches0, matches1)
            matches1 = mutual_check(matches1, matches0)
        if mask0 is not None:
            matches0 = jnp.where(mask0, matches0, -1)
            scores0 = scores0 * mask0
        if mask1 is not None:
            matches1 = jnp.where(mask1, matches1, -1)
            scores1 = scores1 * mask1
        return {
            "matches0": matches0,
            "matches1": matches1,
            "matching_scores0": scores0,
            "matching_scores1": scores1,
            "similarity": sim,
        }

    def loss(self, pred: dict, data: dict):
        if self.conf.loss != "N_pair":
            raise NotImplementedError
        sim = pred["similarity"] * jnp.exp(self.temperature)
        gt = data["gt_assignment"].astype(sim.dtype)  # (B, M, N)
        row_has_gt = gt.sum(-1) > 0
        log_p = jax.nn.log_softmax(sim, axis=-1)
        nll = -(log_p * gt).sum(-1)
        num = jnp.maximum(row_has_gt.sum(-1), 1)
        loss = (nll * row_has_gt).sum(-1) / num
        return {"total": loss}, {}
