"""SuperGlue: attentional GNN matcher with Sinkhorn optimal transport.

Capability parity with reference `gluefactory_nonfree/superglue.py:53-355`:
keypoint-MLP encoder (kpts+score -> 256d added to descriptors), 18 alternating
self/cross attentional GNN layers, final projection, log-domain Sinkhorn with
a learned dustbin score, mutual-NN filtering, NLL loss on the transport plan.

TPU-first: static padded shapes with masks; Sinkhorn runs as a
`lax.fori_loop` in log space (`ops/assignment.log_optimal_transport`) —
mask-aware so padded keypoints carry no transport mass. Gradient
checkpointing per GNN layer (reference `superglue.py:160-170`).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.assignment import filter_matches, log_optimal_transport
from ...ops.attention import mha
from ..base_model import BaseModel


def normalize_keypoints_sg(kpts: jnp.ndarray, size: jnp.ndarray) -> jnp.ndarray:
    """SuperGlue's normalization: center by size/2, scale by 0.7 * max(size)
    (reference `superglue.py:84-93`)."""
    size = size.astype(kpts.dtype)
    center = size / 2.0
    scaling = size.max(axis=-1, keepdims=True) * 0.7
    return (kpts - center[:, None, :]) / scaling[:, None, :]


class MLP(nn.Module):
    """Pointwise MLP: Dense + BatchNorm + ReLU stacks (matches the official
    Conv1d/BatchNorm1d structure for weight conversion)."""

    channels: tuple
    use_bn: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        n = len(self.channels)
        for i, ch in enumerate(self.channels):
            x = nn.Dense(ch, name=f"dense_{i}")(x)
            if i < n - 1:
                if self.use_bn:
                    x = nn.BatchNorm(
                        use_running_average=not train, epsilon=1e-5, momentum=0.9,
                        name=f"bn_{i}", axis_name=None,
                    )(x)
                x = nn.relu(x)
        return x


class AttentionalPropagation(nn.Module):
    dim: int
    num_heads: int

    @nn.compact
    def __call__(self, x, source, mask_q=None, mask_k=None, train: bool = False):
        h = self.num_heads
        d = self.dim
        q = nn.Dense(d, name="proj_q")(x)
        k = nn.Dense(d, name="proj_k")(source)
        v = nn.Dense(d, name="proj_v")(source)

        def heads(t):
            B, N, _ = t.shape
            return t.reshape(B, N, h, d // h).transpose(0, 2, 1, 3)

        ctx = mha(heads(q), heads(k), heads(v), mask_q=mask_q, mask_k=mask_k)
        B, H, N, Dh = ctx.shape
        message = ctx.transpose(0, 2, 1, 3).reshape(B, N, H * Dh)
        message = nn.Dense(d, name="merge")(message)
        update = MLP((2 * d, d), name="mlp")(
            jnp.concatenate([x, message], axis=-1), train=train
        )
        return x + update


class SuperGlue(BaseModel):
    default_conf = {
        "descriptor_dim": 256,
        "keypoint_encoder": [32, 64, 128, 256],
        "n_layers": 9,  # pairs of (self, cross)
        "num_heads": 4,
        "sinkhorn_iterations": 50,
        "filter_threshold": 0.2,
        "checkpointed": True,
        "weights": None,
        "loss": {"nll_balancing": 0.5},
    }
    required_data_keys = [
        "keypoints0", "keypoints1", "descriptors0", "descriptors1",
        "keypoint_scores0", "keypoint_scores1",
    ]

    def setup(self):
        c = self.conf
        d = c.descriptor_dim
        self.kenc = MLP(tuple(list(c.keypoint_encoder) + [d]), name="kenc")
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
        self.final_proj = nn.Dense(d, name="final_proj")
        self.bin_score = self.param("bin_score", lambda k: jnp.asarray(1.0))

    def _forward(self, data: dict, train: bool = False) -> dict:
        c = self.conf
        kpts0, kpts1 = data["keypoints0"], data["keypoints1"]
        desc0, desc1 = data["descriptors0"], data["descriptors1"]
        mask0 = data.get("keypoint_mask0")
        mask1 = data.get("keypoint_mask1")
        size0 = data["view0"]["image_size"] if "view0" in data else data["image_size0"]
        size1 = data["view1"]["image_size"] if "view1" in data else data["image_size1"]

        p0 = normalize_keypoints_sg(kpts0, size0)
        p1 = normalize_keypoints_sg(kpts1, size1)
        # encoder inputs follow the descriptor dtype: keypoints/scores arrive
        # f32, and one f32 operand in `desc + kenc(...)` silently upcasts the
        # whole GNN out of bf16 (same leak class as the rotary tables — see
        # ROADMAP round-4 perf log)
        enc_in0 = jnp.concatenate(
            [p0, data["keypoint_scores0"][..., None]], axis=-1
        ).astype(desc0.dtype)
        enc_in1 = jnp.concatenate(
            [p1, data["keypoint_scores1"][..., None]], axis=-1
        ).astype(desc1.dtype)
        x0 = desc0 + self.kenc(enc_in0, train=train)
        x1 = desc1 + self.kenc(enc_in1, train=train)

        for i, layer in enumerate(self.gnn_layers):
            if i % 2 == 0:  # self-attention
                x0 = layer(x0, x0, mask0, mask0, train)
                x1 = layer(x1, x1, mask1, mask1, train)
            else:  # cross-attention
                x0_new = layer(x0, x1, mask0, mask1, train)
                x1 = layer(x1, x0, mask1, mask0, train)
                x0 = x0_new

        mdesc0 = self.final_proj(x0)
        mdesc1 = self.final_proj(x1)
        sim = jnp.einsum(
            "bmd,bnd->bmn", mdesc0, mdesc1, preferred_element_type=jnp.float32
        ) / c.descriptor_dim**0.5
        scores = log_optimal_transport(
            sim, self.bin_score, c.sinkhorn_iterations, mask0, mask1
        )
        m0, m1, ms0, ms1 = filter_matches(scores, c.filter_threshold, mask0, mask1)
        return {
            "log_assignment": scores,
            "matches0": m0,
            "matches1": m1,
            "matching_scores0": ms0,
            "matching_scores1": ms1,
        }

    def loss(self, pred: dict, data: dict, train: bool = False):
        """NLL on the transport plan (reference `superglue.py:322-352`):
        clamp-the-sum negative counts, plus the reference's training-health
        diagnostics (`nll_pos/neg`, `num_matchable/unmatchable`,
        `bin_score`)."""
        from ..losses import nll_components

        scores = pred["log_assignment"]
        nll_pos, nll_neg, num_pos, num_neg = nll_components(
            scores,
            data["gt_assignment"],
            data["gt_matches0"],
            data["gt_matches1"],
            per_side_clamp=False,
        )
        b = self.conf.loss.nll_balancing
        nll = b * nll_pos + (1.0 - b) * nll_neg
        B = scores.shape[0]
        losses = {
            "total": nll,
            "assignment_nll": nll,
            "nll_pos": nll_pos,
            "nll_neg": nll_neg,
            "num_matchable": num_pos,
            "num_unmatchable": num_neg,
            "bin_score": jnp.broadcast_to(self.bin_score[None], (B,)),
        }
        if train:
            return losses, {}
        from .lightglue import LightGlue

        metrics = LightGlue.matcher_metrics(pred, data)
        return losses, metrics
