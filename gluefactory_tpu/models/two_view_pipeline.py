"""Two-view pipeline: compose extractor -> matcher -> filter -> solver -> GT.

Role of reference `models/two_view_pipeline.py:21-114`. A pipeline is itself a
BaseModel whose sub-models are linen submodules; the whole forward (and the
loss, including on-device GT generation) is one pure jittable function —
TPU-native contrast to the reference's eager composition.

Conventions: per-view inputs under `data["view0"/"view1"]`; extractor outputs
are suffixed `0`/`1` into the flat pred dict; cached features short-circuit
extraction when `allow_no_extract` (reference `two_view_pipeline.py:62-70`).
"""

from __future__ import annotations

from ..core.config import Config
from . import get_model
from .base_model import BaseModel


def has_cache(view_data: dict) -> bool:
    return "cache" in view_data


class TwoViewPipeline(BaseModel):
    default_conf = {
        "extractor": {"name": None},
        "matcher": {"name": None},
        "filter": {"name": None},
        "solver": {"name": None},
        "ground_truth": {"name": None},
        "allow_no_extract": False,
        "run_gt_in_forward": False,
        # run ONE extractor call on the stacked [view0; view1] batch when the
        # image shapes match (halves kernel launches, doubles the conv batch —
        # better MXU utilization on TPU)
        "batch_extraction": True,
    }
    required_data_keys = ["view0", "view1"]
    components = ["extractor", "matcher", "filter", "solver", "ground_truth"]
    strict_conf = False

    def setup(self):
        for comp in self.components:
            comp_conf = self.conf.get(comp, Config({"name": None}))
            if comp_conf.get("name"):
                cls = get_model(comp_conf.name)
                sub_conf = {k: v for k, v in comp_conf.to_dict().items() if k != "name"}
                setattr(self, f"{comp}_model", cls.from_conf(sub_conf))
            else:
                setattr(self, f"{comp}_model", None)

    def component(self, name: str):
        return getattr(self, f"{name}_model")

    def _stop_frozen_gradients(self, pred: dict) -> dict:
        """Cut gradients at a frozen extractor's outputs (role of the
        reference's requires_grad=False freeze): without this, the backward
        pass still traverses — and keeps activations of — the whole extractor
        even though its updates are masked out of the optimizer."""
        import jax

        return jax.tree.map(
            lambda x: jax.lax.stop_gradient(x) if hasattr(x, "dtype") else x, pred
        )

    def extract_view(self, data: dict, i: str, train: bool = False) -> dict:
        data_i = data[f"view{i}"]
        pred_i = dict(data_i.get("cache", {}))
        skip_extract = len(pred_i) > 0 and self.conf.allow_no_extract
        extractor = self.component("extractor")
        if extractor is not None and not skip_extract:
            pred_i = {**extractor({**data_i, **pred_i}, train=train), **pred_i}
            if not extractor.is_trainable:
                pred_i = self._stop_frozen_gradients(pred_i)
        return pred_i

    def _can_batch_extraction(self, data: dict) -> bool:
        if not self.conf.batch_extraction or self.component("extractor") is None:
            return False
        v0, v1 = data["view0"], data["view1"]
        if "cache" in v0 or "cache" in v1:
            return False
        return (
            "image" in v0
            and "image" in v1
            and v0["image"].shape == v1["image"].shape
        )

    def _extract_stacked(self, data: dict, train: bool = False):
        import jax.numpy as jnp

        v0, v1 = data["view0"], data["view1"]
        B = v0["image"].shape[0]
        stacked = {"image": jnp.concatenate([v0["image"], v1["image"]], axis=0)}
        # pass through extra per-view array inputs the extractor may consume
        # (image_size; precomputed wireframe keys from data detect_lines)
        for k in (
            "image_size", "lines", "line_scores", "line_mask",
            "junctions", "junc_scores", "junc_mask", "lines_junc_idx",
        ):
            if k in v0 and k in v1:
                stacked[k] = jnp.concatenate([v0[k], v1[k]], axis=0)
        pred = self.component("extractor")(stacked, train=train)
        if not self.component("extractor").is_trainable:
            pred = self._stop_frozen_gradients(pred)
        pred0 = {k: v[:B] for k, v in pred.items()}
        pred1 = {k: v[B:] for k, v in pred.items()}
        return pred0, pred1

    def _forward(self, data: dict, train: bool = False) -> dict:
        if self._can_batch_extraction(data):
            pred0, pred1 = self._extract_stacked(data, train=train)
        else:
            pred0 = self.extract_view(data, "0", train=train)
            pred1 = self.extract_view(data, "1", train=train)
        pred = {
            **{k + "0": v for k, v in pred0.items()},
            **{k + "1": v for k, v in pred1.items()},
        }
        for comp in ("matcher", "filter", "solver"):
            model = self.component(comp)
            if model is not None:
                pred = {**pred, **model({**data, **pred}, train=train)}
        if self.conf.run_gt_in_forward and self.component("ground_truth") is not None:
            gt_pred = self.component("ground_truth")({**data, **pred}, train=train)
            pred = {**pred, **gt_pred}
        return pred

    def initialize(self, data: dict) -> dict:
        """Create all sub-model parameters, including loss-only ones, by
        delegating to each component's own `initialize`."""
        pred0 = self.extract_view(data, "0", train=True)
        pred1 = self.extract_view(data, "1", train=True)
        pred = {
            **{k + "0": v for k, v in pred0.items()},
            **{k + "1": v for k, v in pred1.items()},
        }
        for comp in ("matcher", "filter", "solver"):
            model = self.component(comp)
            if model is not None:
                pred = {**pred, **model.initialize({**data, **pred})}
        if self.component("ground_truth") is not None:
            pred = {**pred, **self.component("ground_truth")({**data, **pred})}
        return pred

    def loss(self, pred: dict, data: dict, train: bool = False):
        losses = {}
        metrics = {}
        total = 0
        # lazily run GT generation if it did not run in forward
        # (reference two_view_pipeline.py:92-101)
        if not self.conf.run_gt_in_forward and self.component("ground_truth") is not None:
            gt_pred = self.component("ground_truth")({**data, **pred}, train=train)
            pred = {**pred, **gt_pred}
        for comp in ("extractor", "matcher", "filter", "solver"):
            model = self.component(comp)
            if model is None or not model.is_trainable:
                continue
            try:
                losses_c, metrics_c = model.loss(pred, {**pred, **data}, train=train)
            except NotImplementedError:
                continue
            losses.update({f"{comp}_{k}" if k != "total" else k: v for k, v in losses_c.items() if k != "total"})
            metrics.update(metrics_c)
            total = losses_c["total"] + total
        losses["total"] = total
        return losses, metrics
