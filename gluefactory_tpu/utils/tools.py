"""Streaming metric accumulators, seeding, and AUC helpers.

Role of reference `gluefactory/utils/tools.py:17-269`. Accumulators run on the
host over numpy values (metrics are small; keeping them off-device avoids
recompilation and device sync in the logging path).
"""

from __future__ import annotations

import contextlib
import random
from collections.abc import Iterable

import numpy as np


class AverageMetric:
    def __init__(self, elements=None):
        self._sum = 0.0
        self._num = 0
        if elements is not None:
            self.update(np.asarray(elements))

    def update(self, values):
        values = np.atleast_1d(np.asarray(values, dtype=np.float64))
        mask = ~np.isnan(values)
        self._sum += float(values[mask].sum())
        self._num += int(mask.sum())

    def compute(self):
        return np.nan if self._num == 0 else self._sum / self._num


class FAverageMetric(AverageMetric):
    """Average that additionally tracks all raw elements (reference
    `tools.py:36-53`: same NaN-only filtering as AverageMetric, plus a
    full element list)."""

    def __init__(self, elements=None):
        self._elements = []
        super().__init__(elements)

    def update(self, values):
        values = np.atleast_1d(np.asarray(values, dtype=np.float64))
        self._elements.extend(values.tolist())
        super().update(values)


class MedianMetric:
    def __init__(self, elements=None):
        self._elements = []
        if elements is not None:
            self.update(elements)

    def update(self, values):
        values = np.atleast_1d(np.asarray(values, dtype=np.float64))
        self._elements.extend(values.tolist())

    def compute(self):
        arr = np.asarray(self._elements)
        arr = arr[~np.isnan(arr)]
        return np.nan if arr.size == 0 else float(np.median(arr))


class QuantileMetric:
    def __init__(self, q=0.05):
        self.q = q
        self._elements = []

    def update(self, values):
        values = np.atleast_1d(np.asarray(values, dtype=np.float64))
        self._elements.extend(values.tolist())

    def compute(self):
        arr = np.asarray(self._elements)
        arr = arr[~np.isnan(arr)]
        return np.nan if arr.size == 0 else float(np.quantile(arr, self.q))


class RecallMetric:
    """Fraction of values below threshold(s) (reference `tools.py:89-106`)."""

    def __init__(self, ths, elements=None):
        self.ths = ths
        self._elements = []
        if elements is not None:
            self.update(elements)

    def update(self, values):
        values = np.atleast_1d(np.asarray(values, dtype=np.float64))
        self._elements.extend(values.tolist())

    def compute(self):
        if isinstance(self.ths, Iterable):
            return [self._compute(th) for th in self.ths]
        return self._compute(self.ths)

    def _compute(self, th):
        arr = np.asarray(self._elements)
        if arr.size == 0:
            return np.nan
        # reference tools.py:132: STRICT comparison, NaNs count in the
        # denominator (compare False)
        return float((arr < th).sum() / arr.size)


def cal_error_auc(errors, thresholds):
    """Error-recall AUC via trapezoid rule (reference `tools.py:137-149`)."""
    errors = np.sort(np.asarray(errors, dtype=np.float64))
    if errors.size == 0:
        return [0.0] * len(thresholds)
    recall = (np.arange(len(errors)) + 1) / len(errors)
    errors = np.r_[0.0, errors]
    recall = np.r_[0.0, recall]
    aucs = []
    for t in thresholds:
        last_index = np.searchsorted(errors, t)
        r = np.r_[recall[:last_index], recall[last_index - 1]]
        e = np.r_[errors[:last_index], t]
        # reference rounds each AUC to 4 decimals (tools.py:148) — reported
        # table numbers must match digit-for-digit
        aucs.append(float(np.round(np.trapezoid(r, x=e) / t, 4)))
    return aucs


class AUCMetric:
    def __init__(self, thresholds, elements=None):
        self._elements = [] if elements is None else list(np.atleast_1d(elements))
        self.thresholds = thresholds if isinstance(thresholds, list) else [thresholds]

    def update(self, values):
        values = np.atleast_1d(np.asarray(values, dtype=np.float64))
        self._elements.extend(values.tolist())

    def compute(self):
        arr = np.asarray(self._elements)
        arr = arr[~np.isnan(arr)]
        if arr.size == 0:
            return np.nan
        return cal_error_auc(arr, self.thresholds)


class PRMetric:
    """Accumulates (label, prediction) pairs for PR curves (`tools.py:152-167`)."""

    def __init__(self):
        self.labels = []
        self.predictions = []

    def update(self, labels, predictions, mask=None):
        labels = np.asarray(labels)
        predictions = np.asarray(predictions)
        if mask is not None:
            mask = np.asarray(mask).astype(bool)
            labels, predictions = labels[mask], predictions[mask]
        self.labels.append(labels.reshape(-1))
        self.predictions.append(predictions.reshape(-1))

    def compute(self):
        return np.concatenate(self.labels), np.concatenate(self.predictions)

    def reset(self):
        self.labels, self.predictions = [], []


METRICS = {
    "average": AverageMetric,
    "faverage": FAverageMetric,
    "median": MedianMetric,
}


def set_seed(seed: int):
    """Seed host RNGs and return a fresh JAX key (explicit key threading
    replaces torch's global RNG — reference `tools.py:209-215`)."""
    import jax

    random.seed(seed)
    np.random.seed(seed)
    return jax.random.key(seed)


@contextlib.contextmanager
def fork_rng(seed=None):
    """Fork host numpy/python RNG state (reference `tools.py:237-269`).

    Device-side randomness in JAX is already functional (explicit keys), so
    only host state needs save/restore.
    """
    py_state = random.getstate()
    np_state = np.random.get_state()
    try:
        if seed is not None:
            random.seed(seed)
            np.random.seed(seed)
        yield
    finally:
        random.setstate(py_state)
        np.random.set_state(np_state)


def get_random_state():
    return {"python": random.getstate(), "numpy": np.random.get_state()}


def set_random_state(state):
    random.setstate(state["python"])
    np.random.set_state(state["numpy"])
