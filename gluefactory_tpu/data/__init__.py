"""Dataset registry (role of reference `datasets/__init__.py:7-25`)."""

from __future__ import annotations

import importlib.util
import inspect

from .base_dataset import BaseDataset


def get_dataset(name: str):
    paths = [f"gluefactory_tpu.data.{name}", name]
    for path in paths:
        try:
            spec = importlib.util.find_spec(path)
        except (ModuleNotFoundError, ValueError):
            spec = None
        if spec is not None:
            import importlib as _il

            mod = _il.import_module(path)
            classes = [
                c
                for _, c in inspect.getmembers(mod, inspect.isclass)
                if issubclass(c, BaseDataset) and c is not BaseDataset and c.__module__ == path
            ]
            if len(classes) != 1:
                raise RuntimeError(f"expected one dataset in {path}, found {len(classes)}")
            return classes[0]
    raise RuntimeError(f"dataset {name} not found")
