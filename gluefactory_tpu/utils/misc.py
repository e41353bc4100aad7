"""View-dict manipulation helpers (role of reference `gluefactory/utils/misc.py`).

Conventions (SURVEY §1): per-view data lives under `view0`/`view1`/`view2`;
per-view predictions are suffixed `0`/`1`; triplets are flattened into stacked
two-view batches for a single matcher pass.
"""

from __future__ import annotations

import jax.numpy as jnp

from .tensor import map_tensor


def to_view(data: dict, i: str) -> dict:
    """Select keys suffixed by view index `i` and strip the suffix."""
    return {k[: -len(i)]: v for k, v in data.items() if k.endswith(i)}


def get_view(data: dict, pred: dict, i: str) -> dict:
    data_i = data[f"view{i}"]
    pred_i = to_view(pred, i)
    return {**data_i, **pred_i}


def get_twoview(data: dict, pred: dict, idx: str) -> dict:
    """Build a two-view dict for pair `idx` in {'0to1','0to2','1to2'}."""
    i, j = idx[0], idx[-1]
    data_pair = {k: v for k, v in data.items() if isinstance(k, str) and k.endswith(idx)}
    pred0 = {k[:-1] + "0": v for k, v in pred.items() if k.endswith(i)}
    pred1 = {k[:-1] + "1": v for k, v in pred.items() if k.endswith(j)}
    return {
        **data_pair,
        "view0": data[f"view{i}"],
        "view1": data[f"view{j}"],
        "T_0to1": data.get(f"T_{idx}"),
        "H_0to1": data.get(f"H_{idx}"),
        **pred0,
        **pred1,
    }


def stack_twoviews(data: dict, indices=("0to1", "0to2", "1to2")) -> dict:
    """Stack the pairs of a triplet batch along the batch dim so one matcher
    pass handles all three pairs (reference `utils/misc.py:16-38`)."""
    views = [get_twoview_data(data, idx) for idx in indices]
    return map_multi(views)


def get_twoview_data(data: dict, idx: str) -> dict:
    i, j = idx[0], idx[-1]
    out = {"view0": data[f"view{i}"], "view1": data[f"view{j}"]}
    for key in (f"T_{idx}", f"H_{idx}", f"overlap_{idx}"):
        if key in data:
            out[key.replace(idx, "0to1")] = data[key]
    return out


def map_multi(dicts: list):
    """Concatenate a list of identically-structured batch dicts along axis 0."""
    out = {}
    for k, v in dicts[0].items():
        vals = [d[k] for d in dicts]
        if isinstance(v, dict):
            out[k] = map_multi(vals)
        elif hasattr(v, "ndim"):
            out[k] = jnp.concatenate(vals, axis=0)
        elif hasattr(v, "tree_flatten"):
            out[k] = type(v).concatenate(vals)
        else:
            out[k] = vals
    return out


def unstack_twoviews(pred: dict, batch_size: int, indices=("0to1", "0to2", "1to2")):
    """Split stacked two-view predictions back into per-pair dicts."""
    out = {}
    for n, idx in enumerate(indices):
        out[idx] = map_tensor(pred, lambda x: x[n * batch_size : (n + 1) * batch_size])
    return out


def flatten_dict(d: dict, parent: str = "", sep: str = ".") -> dict:
    items = {}
    for k, v in d.items():
        key = parent + sep + k if parent else k
        if isinstance(v, dict):
            items.update(flatten_dict(v, key, sep))
        else:
            items[key] = v
    return items
