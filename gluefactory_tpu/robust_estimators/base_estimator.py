"""Estimator base (role of reference `robust_estimators/base_estimator.py:6-33`)."""

from __future__ import annotations

from ..core.config import Config, merge


class BaseEstimator:
    base_default_conf = {"name": None, "ransac_th": 2.0}
    default_conf: dict = {}

    def __init__(self, conf=None):
        defaults = merge(Config(self.base_default_conf), self.default_conf)
        self.conf = merge(defaults, conf or {})
        self._init(self.conf)

    def _init(self, conf):
        pass

    def __call__(self, data: dict) -> dict:
        """data holds matched points (m_kpts0/m_kpts1, cameras...);
        returns {success, M_0to1, inliers}."""
        return self._forward(data)

    def _forward(self, data: dict) -> dict:
        raise NotImplementedError
