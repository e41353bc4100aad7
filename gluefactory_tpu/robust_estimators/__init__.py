"""Robust estimator registry (role of reference `robust_estimators/__init__.py:6-15`)."""

from __future__ import annotations

import importlib

from .base_estimator import BaseEstimator


def load_estimator(type_: str, name: str):
    mod = importlib.import_module(f"gluefactory_tpu.robust_estimators.{type_}.{name}")
    import inspect

    classes = [
        c
        for _, c in inspect.getmembers(mod, inspect.isclass)
        if issubclass(c, BaseEstimator) and c is not BaseEstimator and c.__module__ == mod.__name__
    ]
    if len(classes) != 1:
        raise RuntimeError(f"expected one estimator in {mod.__name__}")
    return classes[0]
