"""Base class for all models: conf-merged flax.linen modules.

Role of reference `models/base_model.py:13-157` (MetaModel metaclass +
BaseModel). The TPU-native design keeps the same contract —
`default_conf` merged down the inheritance chain, `required_data_keys`
validation, `_forward(data) -> pred`, `loss(pred, data) -> (losses, metrics)` —
but models are `flax.linen` Modules: parameters are pytrees, application is
pure, and "trainable: False" freezing happens functionally in the optimizer
(see `train/optim.py`) instead of mutating Parameter flags.

Conventions preserved (SURVEY §1):
  - every loss is a batch of per-sample scalars shape (B,), total under "total";
  - predictions for view i are suffixed `i` by the pipeline;
  - all shapes are static; variable-size sets carry a boolean mask
    (`keypoint_mask`, ...) that every consumer must honor.
"""

from __future__ import annotations

from typing import Any, ClassVar

import flax.linen as nn

from ..core.config import Config, merge

__all__ = ["BaseModel"]


class BaseModel(nn.Module):
    """Conf-driven model base.

    Subclasses define class vars `default_conf` / `required_data_keys` and
    implement `_forward` (and optionally `loss`, `metrics`). Instantiate with
    `MyModel.from_conf({...})` so defaults are merged and validated; the plain
    constructor expects a fully-merged conf (used internally by linen clones).
    """

    conf: Config

    base_default_conf: ClassVar[dict] = {
        "name": None,
        "trainable": True,  # whether the optimizer updates this model's params
        "freeze_batch_normalization": False,  # use running stats even in train
        "timeit": False,
        "weights_file": None,  # converted-checkpoint msgpack (compat/)
    }
    default_conf: ClassVar[dict] = {}
    required_data_keys: ClassVar[list] = []
    strict_conf: ClassVar[bool] = True

    @classmethod
    def merged_default_conf(cls) -> Config:
        """Merge `default_conf` down the inheritance chain (role of reference
        MetaModel.__prepare__, `base_model.py:13-22`)."""
        out: dict = dict(BaseModel.base_default_conf)
        for klass in reversed(cls.__mro__):
            d = klass.__dict__.get("default_conf")
            if d:
                tmp = merge(Config(out), d)
                out = tmp.to_dict()
        return Config(out)

    @classmethod
    def resolve_conf(cls, conf: Any = None) -> Config:
        defaults = cls.merged_default_conf()
        if conf is None:
            return defaults
        if isinstance(conf, Config):
            conf = conf.to_dict()
        return merge(defaults, conf, strict=cls.strict_conf)

    @classmethod
    def from_conf(cls, conf: Any = None, **kwargs) -> "BaseModel":
        return cls(conf=cls.resolve_conf(conf), **kwargs)

    # -- linen entry points ----------------------------------------------
    def __call__(self, data: dict, **kwargs) -> dict:
        for key in self.required_data_keys:
            assert key in data, f"missing required data key {key} for {type(self).__name__}"
        return self._forward(data, **kwargs)

    def _forward(self, data: dict, **kwargs) -> dict:
        raise NotImplementedError

    def forward_with_loss(self, data: dict, train: bool = True):
        """Single-apply forward + loss (the training step's entry point —
        one `model.apply` keeps forward and loss in the same jit graph).

        `train` is threaded into `loss` so models can reproduce the
        reference's `self.training` gating (deep supervision / confidence
        terms on, matcher_metrics off — reference lightglue.py:592-625,
        gluestick.py:441)."""
        pred = self(data, train=train)
        losses, metrics = self.loss(pred, data, train=train)
        return pred, losses, metrics

    def initialize(self, data: dict) -> dict:
        """Init entry point: exercises forward AND loss so that parameters
        used only in the loss path (e.g. LightGlue's intermediate assignment
        heads and token-confidence MLPs) are created too.

        Use as `model.init(rngs, data, method="initialize")`.
        """
        pred = self(data, train=True)
        try:
            self.loss(pred, data)
        except (NotImplementedError, KeyError, TypeError):
            pass
        return pred

    def loss(self, pred: dict, data: dict, train: bool = False):
        """Return (losses, metrics): dicts of (B,) arrays, total under 'total'.

        `train=True` reproduces the reference's `self.training` semantics
        (extra loss terms on, metrics off); `train=False` the eval ones."""
        raise NotImplementedError

    @property
    def is_trainable(self) -> bool:
        return bool(self.conf.get("trainable", True))
