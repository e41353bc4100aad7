"""Mixed extractor: separate detector + descriptor combination (role of
reference `models/extractors/mixed.py:10-76`): run one model for keypoints
and another for (dense) descriptors, optionally interpolating descriptors
from the dense field at the detector's keypoints."""

from __future__ import annotations

from ...ops.grid_sample import sample_descriptors
from .. import get_model
from ..base_model import BaseModel


class MixedExtractor(BaseModel):
    default_conf = {
        "detector": {"name": None},
        "descriptor": {"name": None},
        "interpolate_descriptors_from": None,  # key of a dense desc map
        "descriptor_stride": 8,
    }
    required_data_keys = ["image"]
    strict_conf = False

    def setup(self):
        for comp in ("detector", "descriptor"):
            conf = self.conf.get(comp)
            if conf and conf.get("name"):
                cls = get_model(conf.name)
                sub = {k: v for k, v in conf.to_dict().items() if k != "name"}
                setattr(self, f"{comp}_model", cls.from_conf(sub))
            else:
                setattr(self, f"{comp}_model", None)

    def _forward(self, data: dict, train: bool = False) -> dict:
        pred = {}
        if self.detector_model is not None:
            pred.update(self.detector_model(data, train=train))
        if self.descriptor_model is not None:
            dpred = self.descriptor_model({**data, **pred}, train=train)
            pred = {**dpred, **pred}
            key = self.conf.interpolate_descriptors_from
            if key is not None and key in dpred:
                pred["descriptors"] = sample_descriptors(
                    pred["keypoints"], dpred[key], stride=self.conf.descriptor_stride
                )
        return pred

    def loss(self, pred, data, train: bool = False):
        losses, metrics = {}, {}
        total = 0
        for comp in ("detector", "descriptor"):
            model = getattr(self, f"{comp}_model")
            if model is not None and model.is_trainable:
                try:
                    losses_c, metrics_c = model.loss(pred, data, train=train)
                except NotImplementedError:
                    continue
                losses.update(losses_c)
                metrics.update(metrics_c)
                total = total + losses_c["total"]
        losses["total"] = total
        return losses, metrics
