"""DeepLSD learned line detector wrapper (role of reference
`models/lines/deeplsd.py:9-106`): same output contract as `lsd.py`
(lines, line_scores, line_mask), backed by the `deeplsd` torch package
through a host callback. Activates when the package + weights are available
locally (zero-egress: no auto-download)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...settings import DATA_PATH
from ..base_model import BaseModel


class DeepLSD(BaseModel):
    default_conf = {
        "max_num_lines": 250,
        "min_length": 15.0,
        "weights_path": "weights/deeplsd_md.tar",  # under DATA_PATH
        "trainable": False,
    }
    required_data_keys = ["image"]

    def setup(self):
        try:
            import deeplsd  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "DeepLSD requires the `deeplsd` package and its weights "
                f"(expected under {DATA_PATH / self.conf.weights_path}); "
                "unavailable in this environment — use `lsd` instead."
            ) from e

    def _detect_host(self, images: np.ndarray):
        import torch
        from deeplsd.models.deeplsd_inference import DeepLSD as _DeepLSD

        if not hasattr(self, "_net"):
            ckpt = torch.load(
                DATA_PATH / self.conf.weights_path, map_location="cpu"
            )
            net = _DeepLSD({"detect_lines": True, "line_detection_params": {}})
            net.load_state_dict(ckpt["model"])
            self._net = net.eval()
        L = int(self.conf.max_num_lines)
        B = images.shape[0]
        out_lines = np.zeros((B, L, 2, 2), np.float32)
        out_scores = np.zeros((B, L), np.float32)
        out_valid = np.zeros((B, L), bool)
        for b in range(B):
            gray = (images[b].mean(-1) * 255).astype(np.float32)
            with torch.no_grad():
                pred = self._net(
                    {"image": torch.from_numpy(gray)[None, None] / 255.0}
                )
            segs = pred["lines"][0]
            lengths = np.linalg.norm(segs[:, 1] - segs[:, 0], axis=-1)
            keep = lengths >= self.conf.min_length
            segs, lengths = segs[keep], lengths[keep]
            scores = np.sqrt(lengths)
            order = np.argsort(-scores)[:L]
            n = len(order)
            out_lines[b, :n] = segs[order]
            out_scores[b, :n] = scores[order] / max(scores.max(), 1e-6)
            out_valid[b, :n] = True
        return out_lines, out_scores, out_valid

    def _forward(self, data: dict, train: bool = False) -> dict:
        image = data["image"]
        B = image.shape[0]
        L = int(self.conf.max_num_lines)
        shapes = (
            jax.ShapeDtypeStruct((B, L, 2, 2), jnp.float32),
            jax.ShapeDtypeStruct((B, L), jnp.float32),
            jax.ShapeDtypeStruct((B, L), jnp.bool_),
        )
        lines, scores, valid = jax.pure_callback(
            lambda img: self._detect_host(np.asarray(img)), shapes, image
        )
        return {"lines": lines, "line_scores": scores, "line_mask": valid}

    def loss(self, pred, data):
        raise NotImplementedError
