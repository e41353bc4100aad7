"""LSD line segment detector (role of reference `models/lines/lsd.py:9-88`,
which wraps pytlsd; here OpenCV's LSD — same algorithm family).

Line detection is inherently host-side (sequential region growing); inside a
jitted pipeline it runs through `jax.pure_callback` with STATIC output shapes:
always `max_num_lines` segments plus a validity mask. Score = sqrt(length) *
detector score (reference lsd.py:44).
"""

from __future__ import annotations

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from ...utils.hostlock import CV2_LOCK as _LSD_LOCK
from ..base_model import BaseModel


def detect_lsd_host(
    images: np.ndarray, max_lines: int, min_length: float
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """images (B, H, W, C) float [0,1] -> (lines (B, L, 2, 2) xy,
    scores (B, L), valid (B, L))."""
    # NOTE: an exception escaping an XLA pure_callback thread aborts the
    # whole process — never let one escape; degrade to "no lines detected".
    try:
        with _LSD_LOCK:
            return _detect_lsd_host_locked(images, max_lines, min_length)
    except Exception as e:  # pragma: no cover - defensive
        import sys

        print(f"[lsd] detection failed, returning no lines: {e}", file=sys.stderr)
        B, L = images.shape[0], max_lines
        return (
            np.zeros((B, L, 2, 2), np.float32),
            np.zeros((B, L), np.float32),
            np.zeros((B, L), bool),
        )


def _detect_lsd_host_locked(
    images: np.ndarray, max_lines: int, min_length: float
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    B = images.shape[0]
    L = max_lines
    out_lines = np.zeros((B, L, 2, 2), np.float32)
    out_scores = np.zeros((B, L), np.float32)
    out_valid = np.zeros((B, L), bool)
    lsd = cv2.createLineSegmentDetector(cv2.LSD_REFINE_ADV)
    for b in range(B):
        img = images[b]
        if img.shape[-1] == 3:
            gray = cv2.cvtColor((img * 255).astype(np.uint8), cv2.COLOR_RGB2GRAY)
        else:
            gray = (img[..., 0] * 255).astype(np.uint8)
        segs, _, _, nfa = lsd.detect(gray)
        if segs is None or len(segs) == 0:
            continue
        segs = segs.reshape(-1, 2, 2)
        lengths = np.linalg.norm(segs[:, 1] - segs[:, 0], axis=-1)
        keep = lengths >= min_length
        segs, lengths = segs[keep], lengths[keep]
        if nfa is not None:
            nfa = np.asarray(nfa).reshape(-1)[keep]
            scores = np.sqrt(lengths) * np.maximum(nfa, 0.0)
        else:
            scores = np.sqrt(lengths)
        order = np.argsort(-scores)[:L]
        n = len(order)
        out_lines[b, :n] = segs[order]
        out_scores[b, :n] = scores[order]
        out_valid[b, :n] = True
        # normalize scores to [0, 1] per image (reference lsd.py:52)
        if n > 0 and out_scores[b, :n].max() > 0:
            out_scores[b, :n] /= out_scores[b, :n].max()
    return out_lines, out_scores, out_valid


class LSD(BaseModel):
    default_conf = {
        "max_num_lines": 250,
        "min_length": 15.0,
    }
    required_data_keys = ["image"]

    def _forward(self, data: dict, train: bool = False) -> dict:
        image = data["image"]
        B = image.shape[0]
        L = int(self.conf.max_num_lines)
        shapes = (
            jax.ShapeDtypeStruct((B, L, 2, 2), jnp.float32),
            jax.ShapeDtypeStruct((B, L), jnp.float32),
            jax.ShapeDtypeStruct((B, L), jnp.bool_),
        )
        from ...utils.hostlock import run_on_host_worker

        lines, scores, valid = jax.pure_callback(
            lambda img: run_on_host_worker(
                detect_lsd_host, np.asarray(img), L, float(self.conf.min_length)
            ),
            shapes,
            image,
        )
        return {"lines": lines, "line_scores": scores, "line_mask": valid}

    def loss(self, pred, data, train: bool = False):
        raise NotImplementedError
