"""GlueStick: joint point + line matcher, TPU-native re-design.

Capability parity with reference `models/matchers/gluestick.py:25-787`:
keypoint encoder + line endpoint encoder (endpoints, offsets, score), 18-layer
self/cross attentional GNN where every *self* layer is followed by a LineLayer
passing messages along the wireframe (gather endpoint descriptors, MLP,
scatter-mean back onto junction nodes), dual-softmax assignment with learned
dustbins separately for points and for lines (line scores from junction
descriptor pairs, max over the two endpoint orderings), NLL losses per
sub-assignment.

TPU-first: all sets are padded + masked (`keypoint_mask`, `line_mask`);
wireframe scatter uses `jax.ops.segment_sum` with static segment counts;
node convention matches the reference — line-junction nodes FIRST in the
node list, `lines_junc_idx (B, L, 2)` indexes into it.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.assignment import log_double_softmax
from ..base_model import BaseModel
from .superglue import normalize_keypoints_sg as normalize_keypoints
from .superglue import MLP, AttentionalPropagation


class EndPtEncoder(nn.Module):
    """Line endpoint encoder: (endpoint(2), offset-to-other(2), score) -> d
    (reference `gluestick.py:502-521`)."""

    dim: int
    layers: tuple

    @nn.compact
    def __call__(self, endpoints, scores, train: bool = False):
        # endpoints (B, L, 2, 2) normalized, scores (B, L)
        B, L = endpoints.shape[:2]
        offset = endpoints[:, :, 1] - endpoints[:, :, 0]  # (B, L, 2)
        offsets = jnp.stack([offset, -offset], axis=2)  # (B, L, 2, 2)
        inputs = jnp.concatenate(
            [
                endpoints.reshape(B, 2 * L, 2),
                offsets.reshape(B, 2 * L, 2),
                # reference quirk (gluestick.py:519 `scores.repeat(1, 2)`):
                # the score channel is [s0..sL-1, s0..sL-1] while endpoints
                # are interleaved [l0e0, l0e1, l1e0, ...] — endpoint 2i+j gets
                # s_{(2i+j) mod L}, not s_i; official weights are trained
                # with this alignment, so it must be reproduced exactly
                jnp.tile(scores, (1, 2))[..., None],
            ],
            axis=-1,
        )  # (B, 2L, 5)
        return MLP(tuple(self.layers) + (self.dim,), name="encoder")(inputs, train=train)


class LineLayer(nn.Module):
    """Wireframe message passing (reference `gluestick.py:589-691`).

    For each line endpoint e at node j: message = MLP([desc_j, desc_partner,
    line_enc_e]); node update = mean of messages of all endpoints at j
    (`attention=False`), or their sum weighted by a per-junction softmax
    over endpoint attention scores (`attention=True`, reference
    `get_endpoint_attention` :613-640 — query is the projected node desc,
    key the projected [partner desc, line encoding]).
    """

    dim: int
    attention: bool = False

    @nn.compact
    def __call__(self, x, line_enc, junc_idx, line_mask=None, train: bool = False):
        # x (B, N, D); line_enc (B, 2L, D); junc_idx (B, 2L) int
        B, N, D = x.shape
        L2 = junc_idx.shape[1]
        desc = jnp.take_along_axis(x, junc_idx[..., None], axis=1)  # (B, 2L, D)
        partner = desc.reshape(B, L2 // 2, 2, D)[:, :, ::-1].reshape(B, L2, D)
        message = jnp.concatenate([desc, partner, line_enc], axis=-1)
        message = MLP((2 * self.dim, self.dim), name="mlp")(message, train=train)
        if line_mask is not None:
            w = jnp.repeat(line_mask, 2, axis=-1).astype(x.dtype)  # (B, 2L)
        else:
            w = jnp.ones((B, L2), x.dtype)
        message = message * w[..., None]

        if self.attention:
            query = nn.Dense(self.dim, name="proj_node")(x)
            query = jnp.take_along_axis(query, junc_idx[..., None], axis=1)
            key = nn.Dense(self.dim, name="proj_neigh")(
                jnp.concatenate([partner, line_enc], axis=-1)
            )
            logit = (query * key).sum(-1).astype(jnp.float32) / self.dim**0.5
            # global max subtraction for stability (normalization makes the
            # shift value-irrelevant); masked endpoints contribute nothing
            logit = jnp.where(w > 0, logit, -jnp.inf)
            prob = jnp.exp(logit - jnp.maximum(jnp.max(logit), -1e30))
            prob = jnp.where(w > 0, prob, 0.0)

            def scatter_attn(one_msg, one_idx, one_p):
                denom = jax.ops.segment_sum(one_p, one_idx, num_segments=N)
                p = one_p / (jnp.take(denom, one_idx) + 1e-8)
                return jax.ops.segment_sum(
                    one_msg * p[..., None].astype(one_msg.dtype), one_idx,
                    num_segments=N)

            update = jax.vmap(scatter_attn)(message, junc_idx, prob)
        else:

            def scatter(one_msg, one_idx, one_w):
                summed = jax.ops.segment_sum(one_msg, one_idx, num_segments=N)
                count = jax.ops.segment_sum(one_w, one_idx, num_segments=N)
                return summed / jnp.maximum(count, 1.0)[..., None]

            update = jax.vmap(scatter)(message, junc_idx, w)
        return x + update.astype(x.dtype)


class GlueStick(BaseModel):
    default_conf = {
        "input_dim": 256,
        "descriptor_dim": 256,
        "weights": None,
        "keypoint_encoder": [32, 64, 128, 256],
        "n_layers": 9,  # pairs of (self+line, cross)
        "num_heads": 4,
        "num_line_iterations": 1,
        "line_attention": False,  # reference gluestick.py:34
        "filter_threshold": 0.2,
        "checkpointed": False,
        # layer indices (into the n_layers self/line blocks) with auxiliary
        # line supervision (reference `gluestick.py:272-292` inter_supervision)
        "inter_supervision": None,
        "loss": {
            "nll_weight": 1.0,
            "nll_balancing": 0.5,
            # per-inter-layer loss weights, indexed by the layer's position
            # in `inter_supervision` (reference gluestick.py:42,378-383)
            "inter_supervision": [0.3, 0.6],
        },
    }
    required_data_keys = [
        "keypoints0", "keypoints1", "descriptors0", "descriptors1",
        "keypoint_scores0", "keypoint_scores1",
        "lines0", "lines1", "lines_junc_idx0", "lines_junc_idx1",
        "line_scores0", "line_scores1",
    ]

    def setup(self):
        c = self.conf
        d = c.descriptor_dim
        if c.input_dim != d:
            self.input_proj = nn.Dense(d, name="input_proj")
        self.kenc = MLP(tuple(list(c.keypoint_encoder) + [d]), name="kenc")
        self.lenc = EndPtEncoder(d, tuple(c.keypoint_encoder), name="lenc")
        # static_argnums: `train` (arg 5, after self) is a python bool that
        # BatchNorm branches on — rematting it as a traced value breaks
        # tracing (TracerBoolConversionError) for any train=True forward
        layer_cls = (
            nn.remat(AttentionalPropagation, static_argnums=(5,))
            if c.checkpointed
            else AttentionalPropagation
        )
        self.gnn_layers = [
            layer_cls(d, c.num_heads, name=f"gnn_{i}") for i in range(2 * c.n_layers)
        ]
        self.line_layers = [
            LineLayer(d, attention=c.line_attention, name=f"line_layer_{i}")
            for i in range(c.n_layers)
        ]
        self.final_proj = nn.Dense(d, name="final_proj")
        self.final_line_proj = nn.Dense(d, name="final_line_proj")
        inter = tuple(c.inter_supervision or ())
        self.inter_line_proj = [
            nn.Dense(d, name=f"inter_line_proj_{i}") for i in range(len(inter))
        ]
        self.inter_layers = inter
        self.bin_score = self.param("bin_score", lambda k: jnp.asarray(1.0))
        self.line_bin_score = self.param("line_bin_score", lambda k: jnp.asarray(1.0))

    def _forward(self, data: dict, train: bool = False) -> dict:
        c = self.conf
        kpts0, kpts1 = data["keypoints0"], data["keypoints1"]
        desc0, desc1 = data["descriptors0"], data["descriptors1"]
        mask0 = data.get("keypoint_mask0")
        mask1 = data.get("keypoint_mask1")
        lmask0 = data.get("line_mask0")
        lmask1 = data.get("line_mask1")
        size0 = data["view0"]["image_size"] if "view0" in data else data["image_size0"]
        size1 = data["view1"]["image_size"] if "view1" in data else data["image_size1"]
        B, L0 = data["lines0"].shape[:2]
        L1 = data["lines1"].shape[1]

        junc_idx0 = data["lines_junc_idx0"].reshape(B, 2 * L0).astype(jnp.int32)
        junc_idx1 = data["lines_junc_idx1"].reshape(B, 2 * L1).astype(jnp.int32)

        if c.input_dim != c.descriptor_dim:
            desc0 = self.input_proj(desc0)
            desc1 = self.input_proj(desc1)

        p0 = normalize_keypoints(kpts0, size0)
        p1 = normalize_keypoints(kpts1, size1)
        # encoder inputs follow the descriptor dtype: f32 keypoints/scores
        # would otherwise upcast `desc + kenc(...)` — and every GNN layer
        # after it — out of bf16 (see ROADMAP round-4 perf log)
        x0 = desc0 + self.kenc(
            jnp.concatenate(
                [p0, data["keypoint_scores0"][..., None]], -1
            ).astype(desc0.dtype),
            train=train,
        )
        x1 = desc1 + self.kenc(
            jnp.concatenate(
                [p1, data["keypoint_scores1"][..., None]], -1
            ).astype(desc1.dtype),
            train=train,
        )

        lines0_n = normalize_keypoints(
            data["lines0"].reshape(B, 2 * L0, 2), size0
        ).reshape(B, L0, 2, 2)
        lines1_n = normalize_keypoints(
            data["lines1"].reshape(B, 2 * L1, 2), size1
        ).reshape(B, L1, 2, 2)
        # line encodings likewise follow the descriptor dtype (they feed the
        # LineLayer message MLPs alongside bf16 node descriptors)
        line_enc0 = self.lenc(
            lines0_n.astype(desc0.dtype),
            data["line_scores0"].astype(desc0.dtype),
            train=train,
        )
        line_enc1 = self.lenc(
            lines1_n.astype(desc1.dtype),
            data["line_scores1"].astype(desc1.dtype),
            train=train,
        )

        inter_descs = {}
        for i in range(2 * c.n_layers):
            layer = self.gnn_layers[i]
            if i % 2 == 0:  # self + line message passing
                x0 = layer(x0, x0, mask0, mask0, train)
                x1 = layer(x1, x1, mask1, mask1, train)
                ll = self.line_layers[i // 2]
                for _ in range(c.num_line_iterations):
                    x0 = ll(x0, line_enc0, junc_idx0, lmask0, train)
                    x1 = ll(x1, line_enc1, junc_idx1, lmask1, train)
            else:  # cross
                x0_new = layer(x0, x1, mask0, mask1, train)
                x1 = layer(x1, x0, mask1, mask0, train)
                x0 = x0_new
            if (i // 2) in self.inter_layers and i % 2 == 1:
                # stashed in train for the aux loss and in eval for the
                # inter-layer line metrics (reference gluestick.py:272-292)
                inter_descs[i // 2] = (x0, x1)

        pred = {}
        # point assignment: dual softmax with dustbin
        mdesc0 = self.final_proj(x0)
        mdesc1 = self.final_proj(x1)
        kp_scores = jnp.einsum(
            "bnd,bmd->bnm", mdesc0, mdesc1, preferred_element_type=jnp.float32
        ) / c.descriptor_dim**0.5
        kp_scores = log_double_softmax(kp_scores, self.bin_score, mask0, mask1)
        from ...ops.assignment import filter_matches

        m0, m1, ms0, ms1 = filter_matches(kp_scores, c.filter_threshold, mask0, mask1)
        pred.update(
            log_assignment=kp_scores, matches0=m0, matches1=m1,
            matching_scores0=ms0, matching_scores1=ms1,
        )

        # line assignment from junction descriptors
        line_scores, lm0, lm1, lms0, lms1, raw = self._line_matches(
            x0, x1, junc_idx0, junc_idx1, lmask0, lmask1
        )
        pred.update(
            line_log_assignment=line_scores, line_matches0=lm0, line_matches1=lm1,
            line_matching_scores0=lms0, line_matching_scores1=lms1,
            raw_line_scores=raw,
        )
        # auxiliary line assignments at intermediate layers (train only)
        for j, layer_idx in enumerate(self.inter_layers):
            if layer_idx not in inter_descs:
                continue
            xi0, xi1 = inter_descs[layer_idx]
            ls_i, lm0_i, lm1_i, lms0_i, lms1_i, _ = self._line_matches(
                xi0, xi1, junc_idx0, junc_idx1, lmask0, lmask1,
                proj=self.inter_line_proj[j],
            )
            pred[f"line_{layer_idx}_log_assignment"] = ls_i
            pred[f"line_{layer_idx}_matches0"] = lm0_i
            pred[f"line_{layer_idx}_matches1"] = lm1_i
            pred[f"line_{layer_idx}_matching_scores0"] = lms0_i
            pred[f"line_{layer_idx}_matching_scores1"] = lms1_i
        return pred

    def _line_matches(self, x0, x1, junc_idx0, junc_idx1, lmask0, lmask1, proj=None):
        c = self.conf
        proj = proj if proj is not None else self.final_line_proj
        mld0 = proj(jnp.take_along_axis(x0, junc_idx0[..., None], axis=1))
        mld1 = proj(jnp.take_along_axis(x1, junc_idx1[..., None], axis=1))
        B, L20, D = mld0.shape
        L0, L1 = L20 // 2, mld1.shape[1] // 2
        s = jnp.einsum("bnd,bmd->bnm", mld0, mld1, preferred_element_type=jnp.float32)
        s = s / c.descriptor_dim**0.5
        s = s.reshape(B, L0, 2, L1, 2)
        raw = 0.5 * jnp.maximum(
            s[:, :, 0, :, 0] + s[:, :, 1, :, 1], s[:, :, 0, :, 1] + s[:, :, 1, :, 0]
        )
        line_scores = log_double_softmax(raw, self.line_bin_score, lmask0, lmask1)
        from ...ops.assignment import filter_matches

        lm0, lm1, lms0, lms1 = filter_matches(
            line_scores, c.filter_threshold, lmask0, lmask1
        )
        return line_scores, lm0, lm1, lms0, lms1, raw

    # ------------------------------------------------------------------

    def _sub_loss(self, losses, la, data, bin_score, prefix="", layer=-1, mask=None):
        """One sub-assignment's NLL + stats, reference-exact
        (`gluestick.py:378-416` sub_loss): loss key
        ``{prefix}{layer_}assignment_nll``, contribution to total =
        ``nll * nll_weight * layer_weight`` where the inter-layer weight
        comes from the ``loss.inter_supervision`` list; the stats
        (`num_matchable`, `num_unmatchable`, `sinkhorn_norm`, `bin_score`)
        are only emitted for the final (layer == -1) sub-assignments."""
        from ..losses import masked_row_norm, nll_components

        c = self.conf
        line_suffix = "" if layer == -1 else f"{layer}_"
        if layer == -1:
            layer_weight = 1.0
        else:
            layer_weight = c.loss.inter_supervision[self.inter_layers.index(layer)]
        nll_pos, nll_neg, num_pos, num_neg = nll_components(
            la,
            data[f"gt_{prefix}assignment"],
            data[f"gt_{prefix}matches0"],
            data[f"gt_{prefix}matches1"],
            per_side_clamp=False,
        )
        nll = c.loss.nll_balancing * nll_pos + (1.0 - c.loss.nll_balancing) * nll_neg
        losses[prefix + line_suffix + "assignment_nll"] = nll
        contribution = 0.0
        if c.loss.nll_weight > 0:
            contribution = nll * c.loss.nll_weight * layer_weight
        if line_suffix == "":
            B = la.shape[0]
            losses[prefix + "num_matchable"] = num_pos
            losses[prefix + "num_unmatchable"] = num_neg
            losses[prefix + "sinkhorn_norm"] = masked_row_norm(la, mask)
            losses[prefix + "bin_score"] = jnp.broadcast_to(bin_score[None], (B,))
        return contribution

    def loss(self, pred: dict, data: dict, train: bool = False):
        """Reference-exact GlueStick loss (`gluestick.py:417-462`): point +
        line + inter-layer-line NLL sub-losses with their diagnostics;
        matcher metrics (points, lines, inter-layer lines) only at eval
        (reference gates on ``not self.training``)."""
        losses = {}
        total = 0.0
        if pred["matches0"].shape[1] > 0 and pred["matches1"].shape[1] > 0:
            total = total + self._sub_loss(
                losses,
                pred["log_assignment"],
                data,
                self.bin_score,
                prefix="",
                mask=data.get("keypoint_mask0"),
            )
        if (
            "gt_line_assignment" in data
            and data["lines0"].shape[1] > 0
            and data["lines1"].shape[1] > 0
        ):
            total = total + self._sub_loss(
                losses,
                pred["line_log_assignment"],
                data,
                self.line_bin_score,
                prefix="line_",
                mask=data.get("line_mask0"),
            )
            # inter-layer line supervision (reference gluestick.py:434-438)
            for layer_idx in self.inter_layers:
                key = f"line_{layer_idx}_log_assignment"
                if key in pred:
                    total = total + self._sub_loss(
                        losses,
                        pred[key],
                        data,
                        self.line_bin_score,
                        prefix="line_",
                        layer=layer_idx,
                    )
        losses["total"] = total

        metrics = {}
        if not train:
            from ..metrics import matcher_metrics

            # reference gluestick.py:440-460: point metrics, line metrics,
            # and inter-layer line metrics (against the final line GT)
            if pred["matches0"].shape[1] > 0 and pred["matches1"].shape[1] > 0:
                metrics.update(matcher_metrics(pred, data))
            if (
                "line_matches0" in pred
                and "gt_line_matches0" in data
                and data["lines0"].shape[1] > 0
                and data["lines1"].shape[1] > 0
            ):
                metrics.update(matcher_metrics(pred, data, prefix="line_"))
                for layer_idx in self.inter_layers:
                    if f"line_{layer_idx}_matches0" in pred:
                        metrics.update(
                            matcher_metrics(
                                pred,
                                data,
                                prefix=f"line_{layer_idx}_",
                                prefix_gt="line_",
                            )
                        )
        return losses, metrics
