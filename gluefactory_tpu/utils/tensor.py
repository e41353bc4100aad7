"""Pytree/batch-dict helpers (role of reference `gluefactory/utils/tensor.py`).

Batches are nested dicts of jnp/np arrays (plus geometry pytrees). In JAX there
is no mutable `.to(device)`; `batch_to_device` is `jax.device_put` with an
optional sharding so the data path composes with pjit meshes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def is_array(x) -> bool:
    return isinstance(x, (jnp.ndarray, np.ndarray))


def map_tensor(input_, func):
    """Apply func to every array leaf of a nested dict/list/tuple structure.

    Unlike `jax.tree.map`, string leaves and None are passed through unchanged
    (batch dicts carry `name` strings — reference `utils/tensor.py:13-27`).
    """
    if isinstance(input_, dict):
        return {k: map_tensor(v, func) for k, v in input_.items()}
    if isinstance(input_, (list, tuple)):
        t = type(input_)
        return t(map_tensor(v, func) for v in input_)
    if is_array(input_):
        return func(input_)
    if hasattr(input_, "tree_flatten"):  # geometry pytrees (Pose/Camera)
        leaves, treedef = input_.tree_flatten()
        return treedef_unflatten(input_, [func(leaf) for leaf in leaves])
    return input_


def treedef_unflatten(obj, leaves):
    return type(obj).tree_unflatten(obj.tree_flatten()[1], leaves)


def batch_to_device(batch, sharding=None):
    """Move a batch to device (optionally with a `jax.sharding.Sharding`)."""

    def _put(x):
        return jax.device_put(x, sharding) if sharding is not None else jax.device_put(x)

    return map_tensor(batch, _put)


def to_numpy(batch):
    return map_tensor(batch, lambda x: np.asarray(jax.device_get(x)))


def rbd(data: dict) -> dict:
    """Remove batch dimension from all array leaves (reference `tensor.py:39`)."""
    return map_tensor(data, lambda x: x[0] if getattr(x, "ndim", 0) > 0 else x)


def index_batch(tensor_dict: dict):
    """Iterate over the items of a batched dict (reference `tensor.py:44-48`)."""
    batch_size = len(next(iter_leaves(tensor_dict)))
    for i in range(batch_size):
        yield map_tensor(tensor_dict, lambda t: t[i])


def iter_leaves(d):
    for v in d.values():
        if isinstance(v, dict):
            yield from iter_leaves(v)
        elif is_array(v):
            yield v
