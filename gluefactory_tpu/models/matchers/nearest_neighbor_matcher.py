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
        matches0, _ = find_nn(sim, self.conf.ratio_thresh, self.conf.distance_thresh)
        matches1, _ = find_nn(
            jnp.swapaxes(sim, 1, 2), self.conf.ratio_thresh, self.conf.distance_thresh
        )
        if self.conf.mutual_check:
            matches0 = mutual_check(matches0, matches1)
            matches1 = mutual_check(matches1, matches0)
        if mask0 is not None:
            matches0 = jnp.where(mask0, matches0, -1)
        if mask1 is not None:
            matches1 = jnp.where(mask1, matches1, -1)
        # reference :65-72: binary matching scores; dual-softmax
        # log-assignment over the raw similarity
        scores0 = (matches0 > -1).astype(sim.dtype)
        scores1 = (matches1 > -1).astype(sim.dtype)
        b, m, n = sim.shape
        la_inner = jax.nn.log_softmax(sim, axis=-1) + jax.nn.log_softmax(sim, axis=-2)
        la = jnp.zeros((b, m + 1, n + 1), sim.dtype).at[:, :-1, :-1].set(la_inner)
        return {
            "matches0": matches0,
            "matches1": matches1,
            "matching_scores0": scores0,
            "matching_scores1": scores1,
            "similarity": sim,
            "log_assignment": la,
        }

    def loss(self, pred: dict, data: dict, train: bool = False):
        """N-pair contrastive loss, reference-exact
        (`nearest_neighbor_matcher.py:74-97`): distance-derived scores
        `temperature * (2 - sqrt(clamp(2(1-sim), 1e-6)))`, dual log-softmax,
        NLL averaged over the GT assignment count."""
        if self.conf.loss != "N_pair":
            raise NotImplementedError
        sim = pred["similarity"]
        scores = jnp.sqrt(jnp.clip(2.0 * (1.0 - sim), 1e-6, None))
        scores = self.temperature * (2.0 - scores)
        assignment = data["gt_assignment"].astype(scores.dtype)  # (B, M, N)
        num = jnp.maximum(assignment.sum((1, 2)), 1.0)
        prob0 = jax.nn.log_softmax(scores, axis=2)
        prob1 = jax.nn.log_softmax(scores, axis=1)
        nll0 = (prob0 * assignment).sum((1, 2)) / num
        nll1 = (prob1 * assignment).sum((1, 2)) / num
        nll = -(nll0 + nll1) / 2.0
        losses = {
            "n_pair_nll": nll,
            "total": nll,
            "num_matchable": num,
            "n_pair_temperature": jnp.asarray(self.temperature)[None],
        }
        # reference :96 computes matcher_metrics only at eval
        # (`not self.training`) — skipping them in the jitted train step
        # keeps ranking-AP argsort/cumsum out of the hot path
        if train or "gt_matches0" not in data:
            return losses, {}
        from ..metrics import matcher_metrics

        return losses, matcher_metrics(pred, data)
