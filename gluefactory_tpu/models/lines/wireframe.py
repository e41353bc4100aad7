"""Wireframe extractor: compose a point extractor + line detector into
GlueStick's input format (role of reference `models/lines/wireframe.py:22-313`).

Steps:
  1. run the point extractor with dense descriptor outputs (device);
  2. detect line segments (host callback, see `lsd.py`);
  3. cluster line endpoints into junctions within `nms_radius` (host callback
     — union-find connected components, exactly DBSCAN(eps, min_samples=1))
     and build `lines_junc_idx`;
  4. mask out keypoints that fall near junctions (device);
  5. node list = [junction slots][keypoint slots] (GlueStick's convention:
     junction nodes FIRST), junction descriptors sampled from the dense map.

All shapes static: `2 * max_num_lines` junction slots + K keypoint slots,
with validity masks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.grid_sample import sample_descriptors
from .. import get_model
from ..base_model import BaseModel
from .lsd import detect_lsd_host


def cluster_endpoints_host(lines: np.ndarray, valid: np.ndarray, radius: float,
                           line_scores: np.ndarray | None = None):
    """DBSCAN(eps=radius, min_samples=1)-exact clustering of line endpoints:
    connected components of the eps-neighborhood graph (union-find), labels
    in first-occurrence order, junction = mean of member endpoints, junction
    score = mean of members' LINE scores (reference
    `models/lines/wireframe.py:55-79`).

    lines (L, 2, 2), valid (L,). Returns (junctions (J_max, 2),
    junc_scores (J_max,), junc_valid (J_max,), lines_junc_idx (L, 2)).
    J_max = 2 * L (static worst case: no merging).
    """
    L = lines.shape[0]
    J_max = 2 * L
    endpoints = lines.reshape(-1, 2)  # (2L, 2)
    ep_valid = np.repeat(valid, 2)
    if line_scores is None:
        line_scores = np.ones(L, np.float32)
    ep_scores = np.repeat(line_scores.astype(np.float32), 2)

    junctions = np.zeros((J_max, 2), np.float32)
    junc_scores = np.zeros(J_max, np.float32)
    junc_valid = np.zeros(J_max, bool)
    assign = np.zeros(2 * L, np.int64)

    idx = np.flatnonzero(ep_valid)
    if idx.size:
        pts = endpoints[idx]
        # union-find over pairs within eps (<=, matching sklearn radius)
        parent = np.arange(idx.size)

        def find(a):
            while parent[a] != a:
                parent[a] = parent[parent[a]]
                a = parent[a]
            return a

        d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
        r2 = radius * radius
        ii, jj = np.nonzero(np.triu(d2 <= r2, k=1))
        for a, b in zip(ii, jj):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        roots = np.array([find(a) for a in range(idx.size)])
        # labels in first-occurrence order (sklearn convention)
        uniq_roots, first = np.unique(roots, return_index=True)
        label_of_root = {
            int(uniq_roots[o]): lbl for lbl, o in enumerate(np.argsort(first))
        }
        labels = np.array([label_of_root[int(r)] for r in roots])
        n_j = int(labels.max()) + 1
        for j in range(n_j):
            m = labels == j
            junctions[j] = pts[m].mean(axis=0)
            junc_scores[j] = ep_scores[idx[m]].mean()
            junc_valid[j] = True
        assign[idx] = labels
    return junctions, junc_scores, junc_valid, assign.reshape(L, 2)


def wireframe_host(images: np.ndarray, max_lines: int, min_length: float, radius: float):
    """Full host side: LSD + endpoint clustering, batched.

    Must NEVER raise: an exception escaping an XLA pure_callback thread
    aborts the process. Failures degrade to "no lines"."""
    B = images.shape[0]
    L = max_lines
    J = 2 * L
    lines = np.zeros((B, L, 2, 2), np.float32)
    scores = np.zeros((B, L), np.float32)
    valid = np.zeros((B, L), bool)
    junctions = np.zeros((B, J, 2), np.float32)
    junc_scores = np.zeros((B, J), np.float32)
    junc_valid = np.zeros((B, J), bool)
    junc_idx = np.zeros((B, L, 2), np.int32)
    try:
        lines, scores, valid = detect_lsd_host(images, max_lines, min_length)
        for b in range(B):
            junctions[b], junc_scores[b], junc_valid[b], junc_idx[b] = (
                cluster_endpoints_host(lines[b], valid[b], radius, scores[b])
            )
    except Exception as e:  # pragma: no cover - defensive
        import sys

        print(f"[wireframe] host step failed, returning empty: {e}", file=sys.stderr)
    return lines, scores, valid, junctions, junc_scores, junc_valid, junc_idx


def precompute_wireframe(
    image: np.ndarray, max_lines: int, min_length: float, radius: float
) -> dict:
    """Per-item host precompute for the data pipeline: LSD lines + junction
    clustering on ONE image (H, W, C) float [0,1]. Returns the per-view keys
    that `WireframeExtractor` consumes directly (no callback in the jitted
    step) — the structural fix for running line detection inside training
    (reference runs LSD inside the model, `models/lines/wireframe.py:163`;
    here training moves it into the data workers like the cached-features
    path, keeping the in-model callback only for single-shot inference)."""
    lines, scores, valid, junctions, jc, jv, jidx = wireframe_host(
        np.asarray(image)[None], int(max_lines), float(min_length), float(radius)
    )
    return {
        "lines": lines[0],
        "line_scores": scores[0],
        "line_mask": valid[0],
        "junctions": junctions[0],
        "junc_scores": jc[0],
        "junc_mask": jv[0],
        "lines_junc_idx": jidx[0],
    }


class WireframeExtractor(BaseModel):
    default_conf = {
        "point_extractor": {
            "name": "superpoint",
            "dense_outputs": True,
            "max_num_keypoints": 1000,
            "force_num_keypoints": False,
            "trainable": False,
        },
        "max_num_lines": 250,
        "min_length": 15.0,
        "nms_radius": 3.0,  # junction merge radius & kpt removal radius
        "trainable": False,
    }
    required_data_keys = ["image"]
    strict_conf = False

    def setup(self):
        pconf = self.conf.point_extractor
        cls = get_model(pconf.name)
        sub = {k: v for k, v in pconf.to_dict().items() if k != "name"}
        sub["dense_outputs"] = True
        self.point_extractor = cls.from_conf(sub)

    def _forward(self, data: dict, train: bool = False) -> dict:
        c = self.conf
        image = data["image"]
        B = image.shape[0]
        L = int(c.max_num_lines)
        J = 2 * L

        ppred = self.point_extractor(data, train=train)
        kpts = ppred["keypoints"]  # (B, K, 2)
        K = kpts.shape[1]

        if "lines" in data and "junctions" in data:
            # wireframe precomputed by the data pipeline (data/*.py
            # detect_lines conf) — no host callback in the jitted step
            lines = data["lines"].astype(jnp.float32)
            line_scores = data["line_scores"].astype(jnp.float32)
            line_mask = data["line_mask"].astype(jnp.bool_)
            junctions = data["junctions"].astype(jnp.float32)
            junc_scores = data["junc_scores"].astype(jnp.float32)
            junc_mask = data["junc_mask"].astype(jnp.bool_)
            junc_idx = data["lines_junc_idx"].astype(jnp.int32)
            return self._assemble(
                data, ppred, kpts,
                lines, line_scores, line_mask,
                junctions, junc_scores, junc_mask, junc_idx,
            )

        shapes = (
            jax.ShapeDtypeStruct((B, L, 2, 2), jnp.float32),  # lines
            jax.ShapeDtypeStruct((B, L), jnp.float32),  # line scores
            jax.ShapeDtypeStruct((B, L), jnp.bool_),  # line mask
            jax.ShapeDtypeStruct((B, J, 2), jnp.float32),  # junctions
            jax.ShapeDtypeStruct((B, J), jnp.float32),  # junction scores
            jax.ShapeDtypeStruct((B, J), jnp.bool_),  # junction mask
            jax.ShapeDtypeStruct((B, L, 2), jnp.int32),  # lines_junc_idx
        )
        from ...utils.hostlock import run_on_host_worker

        def _host(img):
            # bulletproof: nothing may escape an XLA callback thread
            try:
                return run_on_host_worker(
                    wireframe_host,
                    np.asarray(img), L, float(c.min_length), float(c.nms_radius),
                )
            except BaseException as e:  # pragma: no cover - defensive
                import sys
                import traceback

                print(f"[wireframe] callback failed: {e}", file=sys.stderr)
                traceback.print_exc()
                B_ = np.asarray(img).shape[0]
                return (
                    np.zeros((B_, L, 2, 2), np.float32),
                    np.zeros((B_, L), np.float32),
                    np.zeros((B_, L), bool),
                    np.zeros((B_, 2 * L, 2), np.float32),
                    np.zeros((B_, 2 * L), np.float32),
                    np.zeros((B_, 2 * L), bool),
                    np.zeros((B_, L, 2), np.int32),
                )

        (lines, line_scores, line_mask, junctions, junc_scores, junc_mask, junc_idx) = (
            jax.pure_callback(_host, shapes, image)
        )
        return self._assemble(
            data, ppred, kpts,
            lines, line_scores, line_mask,
            junctions, junc_scores, junc_mask, junc_idx,
        )

    def _assemble(
        self, data, ppred, kpts,
        lines, line_scores, line_mask,
        junctions, junc_scores, junc_mask, junc_idx,
    ) -> dict:
        c = self.conf
        # mask keypoints that fall near a junction (reference wireframe.py:186-216)
        d2 = (
            (kpts[:, :, None, :] - junctions[:, None, :, :]) ** 2
        ).sum(-1)  # (B, K, J)
        d2 = jnp.where(junc_mask[:, None, :], d2, jnp.inf)
        near = d2.min(-1) < c.nms_radius**2
        kpt_mask = ppred["keypoint_mask"] & ~near

        # junction descriptors from the dense map; junction scores are the
        # cluster means of member line scores (reference wireframe.py:70-79)
        dense = ppred["dense_descriptors"]  # (B, Hc, Wc, D)
        junc_desc = sample_descriptors(junctions, dense, stride=8)
        junc_scores = junc_scores * junc_mask

        # snap line endpoints to their cluster-mean junctions (reference
        # wireframe.py:81-82 `new_lines = junctions[clusters]`)
        B_, L_ = junc_idx.shape[:2]
        snapped = jnp.take_along_axis(
            junctions, junc_idx.reshape(B_, 2 * L_, 1), axis=1
        ).reshape(B_, L_, 2, 2)
        orig_lines = lines
        lines = jnp.where(line_mask[..., None, None], snapped, lines)

        # node list: junctions first (GlueStick convention), then keypoints
        all_kpts = jnp.concatenate([junctions, kpts], axis=1)
        all_scores = jnp.concatenate([junc_scores, ppred["keypoint_scores"]], axis=1)
        all_desc = jnp.concatenate([junc_desc, ppred["descriptors"]], axis=1)
        all_mask = jnp.concatenate([junc_mask, kpt_mask], axis=1)

        return {
            "keypoints": all_kpts,
            "keypoint_scores": all_scores,
            "descriptors": all_desc,
            "keypoint_mask": all_mask,
            "lines": lines,
            "line_scores": line_scores,
            "line_mask": line_mask,
            "lines_junc_idx": junc_idx.astype(jnp.int32),
            "orig_lines": orig_lines,
        }

    def loss(self, pred, data, train: bool = False):
        raise NotImplementedError
