"""Regular-grid "keypoints" for dense/semi-dense setups (role of reference
`models/extractors/grid_extractor.py:20-60`)."""

from __future__ import annotations

import jax.numpy as jnp

from ..base_model import BaseModel


class GridExtractor(BaseModel):
    default_conf = {"cell_size": 14, "extract_descriptors": False}
    required_data_keys = ["image"]

    def _forward(self, data: dict, train: bool = False) -> dict:
        image = data["image"]
        B, H, W, _ = image.shape
        cs = self.conf.cell_size
        gh, gw = H // cs, W // cs
        x = (jnp.arange(gw, dtype=jnp.float32) + 0.5) * cs
        y = (jnp.arange(gh, dtype=jnp.float32) + 0.5) * cs
        xx, yy = jnp.meshgrid(x, y, indexing="xy")
        kpts = jnp.stack([xx.ravel(), yy.ravel()], axis=-1)
        kpts = jnp.tile(kpts[None], (B, 1, 1))
        N = kpts.shape[1]
        pred = {
            "keypoints": kpts,
            "keypoint_scores": jnp.ones((B, N), jnp.float32),
            "keypoint_mask": jnp.ones((B, N), bool),
        }
        return pred

    def loss(self, pred, data, train: bool = False):
        raise NotImplementedError
