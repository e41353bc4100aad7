"""LightGlue: attentional sparse-feature matcher, TPU-native re-design.

Capability parity with reference `models/matchers/lightglue.py:1-630`:
9 transformer layers of rotary self-attention + shared-QK bidirectional
cross-attention, learnable Fourier positional encoding, sigmoid-gated
double-softmax assignment head, mutual-NN match filtering, deep-supervision
NLL loss with per-layer assignment heads and token-confidence BCE.

TPU-first design decisions:
  - static padded shapes with `keypoint_mask0/1` everywhere (the reference's
    `force_num_keypoints` convention, SURVEY §5.7) — no ragged tensors;
  - attention runs through `ops.attention` (jnp reference path; the fused
    Pallas kernel in `ops/pallas` has identical semantics) in bf16-friendly
    einsums that map onto the MXU;
  - adaptive depth/width pruning (reference `lightglue.py:461-526`, an
    eager-mode, batch-1 inference optimization) is realized as masking:
    width pruning zeroes the mask of low-matchability points instead of
    gathering a smaller tensor, keeping shapes static for XLA;
  - per-layer gradient checkpointing via `jax.checkpoint` (reference uses
    torch checkpointing, `lightglue.py:474-482`).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.assignment import filter_matches, sigmoid_log_double_softmax
from ...ops.attention import apply_rotary, bidirectional_attention, mha
from ..base_model import BaseModel


def normalize_keypoints(kpts: jnp.ndarray, size: jnp.ndarray) -> jnp.ndarray:
    """Center and scale keypoints by image size (B, 2) [w, h] — reference
    `lightglue.py:30-41`."""
    size = size.astype(kpts.dtype)
    shift = size / 2.0
    scale = size.max(axis=-1, keepdims=True) / 2.0
    return (kpts - shift[:, None, :]) / scale[:, None, :]


class LearnableFourierPosEnc(nn.Module):
    """2D (or 4D with scale/ori) -> per-pair rotary angles (B, N, head_dim/2)."""

    dim: int  # head dim

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        theta = nn.Dense(self.dim // 2, use_bias=False, name="Wr")(x)
        return jnp.cos(theta), jnp.sin(theta)


class FFN(nn.Module):
    """ffn([x, message]) with residual: Linear(2d->2d), LayerNorm, GELU,
    Linear(2d->d)."""

    dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, message: jnp.ndarray) -> jnp.ndarray:
        y = jnp.concatenate([x, message], axis=-1)
        y = nn.Dense(2 * self.dim, name="fc1")(y)
        y = nn.LayerNorm(epsilon=1e-5, name="norm")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, name="fc2")(y)
        return x + y


def split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    B, N, D = x.shape
    return x.reshape(B, N, num_heads, D // num_heads).transpose(0, 2, 1, 3)


def merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    B, H, N, Dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(B, N, H * Dh)


class SelfBlock(nn.Module):
    dim: int
    num_heads: int
    flash: bool | None = None

    @nn.compact
    def __call__(self, x, enc, mask=None):
        cos, sin = enc
        qkv = nn.Dense(3 * self.dim, name="Wqkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = split_heads(q, self.num_heads)
        k = split_heads(k, self.num_heads)
        v = split_heads(v, self.num_heads)
        q = apply_rotary(q, cos[:, None], sin[:, None])
        k = apply_rotary(k, cos[:, None], sin[:, None])
        ctx = mha(q, k, v, mask_q=mask, mask_k=mask, flash=self.flash)
        message = nn.Dense(self.dim, name="out_proj")(merge_heads(ctx))
        return FFN(self.dim, name="ffn")(x, message)


class CrossBlock(nn.Module):
    dim: int
    num_heads: int
    flash: bool | None = None

    @nn.compact
    def __call__(self, x0, x1, mask0=None, mask1=None):
        to_qk = nn.Dense(self.dim, name="to_qk")
        to_v = nn.Dense(self.dim, name="to_v")
        stacked = x0.shape == x1.shape
        if stacked:  # one shared-weight projection pass over both views
            B = x0.shape[0]
            x01 = jnp.concatenate([x0, x1], axis=0)
            qk01 = to_qk(x01)
            v01 = to_v(x01)
            qk0 = split_heads(qk01[:B], self.num_heads)
            qk1 = split_heads(qk01[B:], self.num_heads)
            v0 = split_heads(v01[:B], self.num_heads)
            v1 = split_heads(v01[B:], self.num_heads)
        else:
            qk0 = split_heads(to_qk(x0), self.num_heads)
            qk1 = split_heads(to_qk(x1), self.num_heads)
            v0 = split_heads(to_v(x0), self.num_heads)
            v1 = split_heads(to_v(x1), self.num_heads)
        m0, m1 = bidirectional_attention(
            qk0, qk1, v0, v1, mask0, mask1, flash=self.flash
        )
        out_proj = nn.Dense(self.dim, name="out_proj")
        ffn = FFN(self.dim, name="ffn")
        if stacked:
            m01 = out_proj(
                merge_heads(jnp.concatenate([m0, m1], axis=0)))
            y01 = ffn(jnp.concatenate([x0, x1], axis=0), m01)
            return y01[:B], y01[B:]
        m0 = out_proj(merge_heads(m0))
        m1 = out_proj(merge_heads(m1))
        return ffn(x0, m0), ffn(x1, m1)


class TransformerLayer(nn.Module):
    dim: int
    num_heads: int
    flash: bool | None = None

    @nn.compact
    def __call__(self, desc0, desc1, enc0, enc1, mask0=None, mask1=None):
        self_attn = SelfBlock(self.dim, self.num_heads, self.flash, name="self_attn")
        if desc0.shape == desc1.shape:
            # both views through ONE batched self-attention pass (weights are
            # shared; the stack halves dispatches and doubles kernel batch)
            B = desc0.shape[0]
            x = jnp.concatenate([desc0, desc1], axis=0)
            enc = tuple(
                jnp.concatenate([e0, e1], axis=0)
                for e0, e1 in zip(enc0, enc1)
            )
            if mask0 is None and mask1 is None:
                mask = None
            else:
                ones = jnp.ones(desc0.shape[:2], bool)
                mask = jnp.concatenate(
                    [ones if mask0 is None else mask0,
                     ones if mask1 is None else mask1], axis=0)
            x = self_attn(x, enc, mask)
            desc0, desc1 = x[:B], x[B:]
        else:
            desc0 = self_attn(desc0, enc0, mask0)
            desc1 = self_attn(desc1, enc1, mask1)
        desc0, desc1 = CrossBlock(
            self.dim, self.num_heads, self.flash, name="cross_attn"
        )(desc0, desc1, mask0, mask1)
        return desc0, desc1


class MatchAssignment(nn.Module):
    dim: int
    int8_sim: bool = False

    def setup(self):
        # setup-style (not @nn.compact) so `get_matchability` can run the
        # matchability head alone — the serving early-exit loop needs z0/z1
        # per layer without paying the M×N similarity matrix
        self.final_proj = nn.Dense(self.dim, name="final_proj")
        self.matchability = nn.Dense(1, name="matchability")

    def __call__(self, desc0, desc1, mask0=None, mask1=None):
        mdesc0 = self.final_proj(desc0)
        mdesc1 = self.final_proj(desc1)
        d = self.dim
        scale = 1.0 / d**0.25
        if self.int8_sim:
            # dynamic per-token symmetric int8 quantization of the projected
            # descriptors; the M×N similarity runs on the MXU at the int8
            # rate and is dequantized by the outer product of row scales
            def quant(x):
                s = jnp.max(jnp.abs(x), axis=-1, keepdims=True) / 127.0
                s = jnp.maximum(s, 1e-12)
                q = jnp.clip(jnp.round(x / s), -127, 127).astype(jnp.int8)
                return q, s[..., 0]

            q0, s0 = quant(mdesc0.astype(jnp.float32))
            q1, s1 = quant(mdesc1.astype(jnp.float32))
            isim = jnp.einsum(
                "bmd,bnd->bmn", q0, q1, preferred_element_type=jnp.int32
            )
            sim = isim.astype(jnp.float32) * (
                (s0[:, :, None] * s1[:, None, :]) * (scale * scale)
            )
        else:
            sim = jnp.einsum(
                "bmd,bnd->bmn",
                mdesc0 * scale,
                mdesc1 * scale,
                preferred_element_type=jnp.float32,
            )
        z0 = self.matchability(desc0).squeeze(-1).astype(jnp.float32)
        z1 = self.matchability(desc1).squeeze(-1).astype(jnp.float32)
        scores = sigmoid_log_double_softmax(sim, z0, z1, mask0, mask1)
        return scores, sim, z0, z1

    def get_matchability(self, desc):
        """Matchability logit alone (reference `lightglue.py:283-287`)."""
        return self.matchability(desc).squeeze(-1).astype(jnp.float32)


class TokenConfidence(nn.Module):
    @nn.compact
    def __call__(self, desc0, desc1, return_logits: bool = False):
        token = nn.Dense(1, name="token")
        l0 = token(desc0).squeeze(-1).astype(jnp.float32)
        l1 = token(desc1).squeeze(-1).astype(jnp.float32)
        if return_logits:
            return l0, l1
        return jax.nn.sigmoid(l0), jax.nn.sigmoid(l1)


# Minimum keypoint count for adaptive pruning to pay for itself (role of the
# reference's device-keyed `pruning_keypoint_thresholds`,
# lightglue.py:572-576: cpu/mps -1, cuda 1024, flash 1536). The TPU entry is
# MEASURED on v5e (scripts_dev/profile_pruning_guard.py, exit depth 5/9,
# B=4 bf16, sweep recorded in ROADMAP.md): the while-loop serving path wins
# at EVERY size down to 64 keypoints (0.222 vs 0.256 ms/pair @64; 2.89 vs
# 4.84 @2048) — unlike CUDA there are no kernel-launch/dynamic-shape costs,
# the early exit only trades confidence-head evals against skipped layers —
# so the TPU guard never fires. The conf override remains for custom
# deployments (e.g. workloads whose real exit depth is ~9).
# keyed by jax.default_backend() names ("gpu", not "cuda")
PRUNING_KEYPOINT_THRESHOLDS = {"cpu": -1, "gpu": 1024, "tpu": -1}


class LightGlue(BaseModel):
    default_conf = {
        "input_dim": 256,
        "descriptor_dim": 256,
        "add_scale_ori": False,
        "n_layers": 9,
        "num_heads": 4,
        "flash": True,  # use the fused Pallas attention kernel on TPU
        "depth_confidence": -1.0,  # early-exit confidence (masked variant)
        "width_confidence": -1.0,  # point-pruning confidence (masked variant)
        # below this many keypoints adaptive pruning LOSES time (reference
        # lightglue.py:572-576 device table); "auto" resolves per backend via
        # PRUNING_KEYPOINT_THRESHOLDS, an int overrides, -1 never guards
        "pruning_min_kpts": "auto",
        # int8 descriptor similarity in the assignment head (dynamic
        # per-token quantization; MXU int8 rate) — perf lever, off by default
        "int8_similarity": False,
        "filter_threshold": 0.1,
        "checkpointed": True,
        "weights": None,
        "loss": {
            "gamma": 1.0,
            "fn": "nll",
            "nll_balancing": 0.5,
            "confidence_weight": 1.0,
        },
    }
    required_data_keys = ["keypoints0", "keypoints1", "descriptors0", "descriptors1"]

    def setup(self):
        c = self.conf
        head_dim = c.descriptor_dim // c.num_heads
        self.input_proj = nn.Dense(c.descriptor_dim, name="input_proj")
        self.posenc = LearnableFourierPosEnc(head_dim, name="posenc")
        layer_cls = nn.remat(TransformerLayer) if c.checkpointed else TransformerLayer
        self.transformers = [
            layer_cls(
                c.descriptor_dim, c.num_heads, bool(c.flash),
                name=f"transformers_{i}",
            )
            for i in range(c.n_layers)
        ]
        self.log_assignment = [
            MatchAssignment(
                c.descriptor_dim,
                int8_sim=bool(c.int8_similarity),
                name=f"log_assignment_{i}",
            )
            for i in range(c.n_layers)
        ]
        self.token_confidence = [
            TokenConfidence(name=f"token_confidence_{i}") for i in range(c.n_layers - 1)
        ]

    def _forward(self, data: dict, train: bool = False) -> dict:
        c = self.conf
        kpts0 = data["keypoints0"]
        kpts1 = data["keypoints1"]
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

        desc0 = self.input_proj(data["descriptors0"])
        desc1 = self.input_proj(data["descriptors1"])
        enc0 = self.posenc(p0)
        enc1 = self.posenc(p1)

        # conf.flash reaches the attention call sites as a module attribute
        # on each TransformerLayer (threaded, not a module-global toggle)
        do_prune = not train and (c.depth_confidence > 0 or c.width_confidence > 0)
        # pruning loses time on small problems (reference lightglue.py:572-576
        # device guard); static shapes make this a trace-time decision
        if do_prune and max(kpts0.shape[1], kpts1.shape[1]) < self.pruning_min_kpts():
            do_prune = False
        if do_prune:
            scores, prune0, prune1 = self._pruned_forward(
                desc0, desc1, enc0, enc1, mask0, mask1
            )
            all_desc0, all_desc1 = [], []
        else:
            all_desc0, all_desc1 = [], []
            for i in range(c.n_layers):
                desc0, desc1 = self.transformers[i](
                    desc0, desc1, enc0, enc1, mask0, mask1
                )
                if train:
                    all_desc0.append(desc0)
                    all_desc1.append(desc1)
            scores, sim, z0, z1 = self.log_assignment[c.n_layers - 1](
                desc0, desc1, mask0, mask1
            )
        m0, m1, mscores0, mscores1 = filter_matches(scores, c.filter_threshold, mask0, mask1)

        pred = {
            "log_assignment": scores,
            "matches0": m0,
            "matches1": m1,
            "matching_scores0": mscores0,
            "matching_scores1": mscores1,
        }
        if train:
            pred["ref_descriptors0"] = jnp.stack(all_desc0, axis=1)  # (B, L, M, D)
            pred["ref_descriptors1"] = jnp.stack(all_desc1, axis=1)
        if do_prune:
            pred["prune0"] = prune0
            pred["prune1"] = prune1
        return pred

    def pruning_min_kpts(self) -> int:
        """Resolved pruning guard threshold (reference lightglue.py:572-576;
        conf "auto" -> per-backend table, int -> fixed, -1 -> no guard)."""
        v = self.conf.pruning_min_kpts
        if v == "auto":
            return PRUNING_KEYPOINT_THRESHOLDS.get(jax.default_backend(), -1)
        return int(v)

    def _confidence_threshold(self, layer_index: int) -> float:
        """Per-layer confidence threshold (reference `lightglue.py:540-544`)."""
        import math

        return min(0.8 + 0.1 * math.exp(-4.0 * layer_index / self.conf.n_layers), 1.0)

    def _pruned_forward(self, desc0, desc1, enc0, enc1, mask0, mask1):
        """Adaptive depth + width pruning, masked static-shape realization of
        reference `lightglue.py:461-526` (an eager, batch-1 inference path).

        - width pruning: confidently-unmatchable tokens get their active mask
          cleared (the reference gathers a smaller tensor; masking is the
          XLA-native equivalent — excluded from attention, descriptors frozen);
        - depth pruning: once enough tokens are confident, an item "exits" —
          its descriptors freeze and its assignment is taken from the exit
          layer. Exact output parity with the reference for batch size 1.
        """
        c = self.conf
        B, M, _ = desc0.shape
        N = desc1.shape[1]
        active0 = mask0 if mask0 is not None else jnp.ones((B, M), bool)
        active1 = mask1 if mask1 is not None else jnp.ones((B, N), bool)
        # reference convention (lightglue.py:468-470,504-511): prune starts at
        # 1 and each token KEPT through a pruning round gains +1, i.e.
        # prune = 1 + number of pruning rounds survived (= n_layers when
        # never pruned; = n_layers everywhere when width pruning is off)
        prune0 = jnp.ones((B, M), jnp.int32)
        prune1 = jnp.ones((B, N), jnp.int32)
        stopped = jnp.zeros((B,), bool)
        final_scores = jnp.full((B, M + 1, N + 1), -jnp.inf, desc0.dtype)

        for i in range(c.n_layers):
            nd0, nd1 = self.transformers[i](desc0, desc1, enc0, enc1, active0, active1)
            desc0 = jnp.where(stopped[:, None, None], desc0, nd0)
            desc1 = jnp.where(stopped[:, None, None], desc1, nd1)
            scores_i, sim_i, z0_i, z1_i = self.log_assignment[i](
                desc0, desc1, active0, active1
            )
            last = i == c.n_layers - 1
            if not last:
                conf_th = self._confidence_threshold(i)
                # the reference computes token confidences only for the depth
                # check (token0/1 stay None when depth pruning is off, and the
                # width keep-rule then drops its low-confidence clause,
                # lightglue.py:549-556)
                c0 = c1 = None
                if c.depth_confidence > 0:
                    c0, c1 = self.token_confidence[i](desc0, desc1)
                    confident0 = (c0 >= conf_th) | ~active0
                    confident1 = (c1 >= conf_th) | ~active1
                    num = jnp.maximum(
                        active0.sum(-1) + active1.sum(-1), 1
                    ).astype(jnp.float32)
                    ratio = (
                        (confident0 & active0).sum(-1) + (confident1 & active1).sum(-1)
                    ).astype(jnp.float32) / num
                    stop_now = (ratio > c.depth_confidence) & ~stopped
                else:
                    stop_now = jnp.zeros((B,), bool)
                final_scores = jnp.where(
                    stop_now[:, None, None], scores_i, final_scores
                )
                stopped = stopped | stop_now
                # width pruning: drop confidently-unmatchable tokens
                if c.width_confidence > 0:
                    keep0 = jax.nn.sigmoid(z0_i) > (1.0 - c.width_confidence)
                    keep1 = jax.nn.sigmoid(z1_i) > (1.0 - c.width_confidence)
                    if c0 is not None:  # low-confidence points are never pruned
                        keep0 = keep0 | (c0 <= conf_th)
                        keep1 = keep1 | (c1 <= conf_th)
                    new_active0 = active0 & jnp.where(stopped[:, None], active0, keep0)
                    new_active1 = active1 & jnp.where(stopped[:, None], active1, keep1)
                    prune0 = prune0 + (new_active0 & ~stopped[:, None])
                    prune1 = prune1 + (new_active1 & ~stopped[:, None])
                    active0, active1 = new_active0, new_active1
            else:
                final_scores = jnp.where(
                    stopped[:, None, None], final_scores, scores_i
                )
        if not c.width_confidence > 0:
            prune0 = jnp.full((B, M), c.n_layers, jnp.int32)
            prune1 = jnp.full((B, N), c.n_layers, jnp.int32)
        return final_scores, prune0, prune1

    def initialize(self, data: dict) -> dict:
        """Create ALL parameters, including the per-layer assignment heads and
        token-confidence MLPs used only in the loss (deep supervision)."""
        pred = self(data, train=True)
        mask0 = data.get("keypoint_mask0")
        mask1 = data.get("keypoint_mask1")
        for i in range(self.conf.n_layers - 1):
            d0 = pred["ref_descriptors0"][:, i]
            d1 = pred["ref_descriptors1"][:, i]
            self.log_assignment[i](d0, d1, mask0, mask1)
            self.token_confidence[i](d0, d1)
        return pred

    # ------------------------------------------------------------------
    # Loss: deep supervision (reference lightglue.py:578-627)
    # ------------------------------------------------------------------
    def _nll(self, log_assignment, data):
        """Balanced NLL of a (B, M+1, N+1) log assignment vs GT plus its
        components (reference NLLLoss / weight_loss, losses.py:6-60 —
        per-side clamping of the negative counts)."""
        from ..losses import nll_components

        nll_pos, nll_neg, num_pos, num_neg = nll_components(
            log_assignment,
            data["gt_assignment"],
            data["gt_matches0"],
            data["gt_matches1"],
            per_side_clamp=True,
        )
        b = self.conf.loss.nll_balancing
        nll = b * nll_pos + (1.0 - b) * nll_neg
        return nll, nll_pos, nll_neg, num_pos, num_neg

    def loss(self, pred: dict, data: dict, train: bool = False):
        """Reference-exact loss (lightglue.py:578-625).

        train=True (reference ``self.training``): deep supervision over all
        intermediate layers — weight ``gamma ** (L-i-1)`` whenever
        ``gamma > 0`` (the shipped default gamma=1.0 gives every layer
        weight 1), ``i + 1`` otherwise — normalized by the weight sum, plus
        the token-confidence BCE; metrics skipped.

        train=False: the reference stashes only the final layer's
        descriptors at eval (lightglue.py:485-487), so its loss reduces to
        the final-layer NLL with no deep supervision or confidence term, and
        ``matcher_metrics`` are computed (lightglue.py:622-625).
        """
        from ..losses import masked_row_norm

        c = self.conf
        mask0 = data.get("keypoint_mask0")
        mask1 = data.get("keypoint_mask1")

        def layer_scores(i):
            d0 = pred["ref_descriptors0"][:, i]
            d1 = pred["ref_descriptors1"][:, i]
            scores, _, _, _ = self.log_assignment[i](d0, d1, mask0, mask1)
            return scores

        nll_final, nll_pos, nll_neg, num_pos, num_neg = self._nll(
            pred["log_assignment"], data
        )
        losses = {
            "total": nll_final,
            "last": jax.lax.stop_gradient(nll_final),
            "assignment_nll": nll_final,
            "nll_pos": nll_pos,
            "nll_neg": nll_neg,
            "num_matchable": num_pos,
            "num_unmatchable": num_neg,
            "row_norm": masked_row_norm(pred["log_assignment"], mask0),
        }

        if not train:
            return losses, self.matcher_metrics(pred, data)

        L = pred["ref_descriptors0"].shape[1]
        final_scores = pred["log_assignment"]
        # full-row/-column argmax incl. the dustbin (reference
        # TokenConfidence.loss, lightglue.py:81-94)
        final_m0 = jnp.argmax(final_scores[:, :-1, :], axis=-1)
        final_m1 = jnp.argmax(final_scores[:, :, :-1], axis=1)
        total = nll_final
        sum_weights = 1.0
        confidence_loss = 0.0
        for i in range(L - 1):
            scores_i = layer_scores(i)
            nll_i, _, _, _, _ = self._nll(scores_i, data)
            # reference lightglue.py:601-604: gamma**(N-i-1) whenever
            # gamma > 0 (shipped default 1.0 => all-ones), else i+1
            if c.loss.gamma > 0.0:
                weight = c.loss.gamma ** (L - i - 1)
            else:
                weight = float(i + 1)
            total = total + nll_i * weight
            sum_weights += weight
            # token confidence BCE: predict whether this layer's match
            # equals the final one (reference lightglue.py:81-94)
            m0_i = jnp.argmax(scores_i[:, :-1, :], axis=-1)
            m1_i = jnp.argmax(scores_i[:, :, :-1], axis=1)
            correct0 = (m0_i == final_m0).astype(jnp.float32)
            correct1 = (m1_i == final_m1).astype(jnp.float32)
            l0, l1 = self.token_confidence[i](
                jax.lax.stop_gradient(pred["ref_descriptors0"][:, i]),
                jax.lax.stop_gradient(pred["ref_descriptors1"][:, i]),
                return_logits=True,
            )
            # stable logit-space BCE in fp32: log(sigmoid(l) + eps) in
            # bf16 underflows (eps rounds to 0) and produced NaNs
            bce0 = jnp.clip(l0, 0) - l0 * correct0 + jnp.log1p(jnp.exp(-jnp.abs(l0)))
            bce1 = jnp.clip(l1, 0) - l1 * correct1 + jnp.log1p(jnp.exp(-jnp.abs(l1)))
            if mask0 is not None:
                bce0 = (bce0 * mask0).sum(-1) / jnp.maximum(mask0.sum(-1), 1)
            else:
                bce0 = bce0.mean(-1)
            if mask1 is not None:
                bce1 = (bce1 * mask1).sum(-1) / jnp.maximum(mask1.sum(-1), 1)
            else:
                bce1 = bce1.mean(-1)
            confidence_loss = confidence_loss + (bce0 + bce1) / 2.0
        total = total / sum_weights
        losses["confidence"] = confidence_loss / max(L - 1, 1)
        total = total + c.loss.confidence_weight * losses["confidence"]
        losses["total"] = total
        return losses, {}

    @staticmethod
    def matcher_metrics(pred: dict, data: dict) -> dict:
        """Reference-exact recall/precision/accuracy/ranking-AP
        (`models/utils/metrics.py:5-51` via `models/metrics.py`)."""
        from ..metrics import matcher_metrics

        return matcher_metrics(pred, data)
