"""Export model predictions to an h5 cache (role of reference
`utils/export_predictions.py:17-81`).

Loop 1 of the eval protocol: run inference over a dataset, un-scale
keypoints/lines back to original image resolution, write one h5 group per
item. Masked (padded) keypoints are trimmed before writing so the cache holds
exactly the valid sets — loop 2 and the reference CacheLoader see ragged,
original-resolution features, identical semantics to the reference.
"""

from __future__ import annotations

from pathlib import Path

import h5py
import numpy as np

from .. import logger
from ..data.base_dataset import prepare_batch
from ..utils.tensor import map_tensor


def unscale_keypoints(pred: dict, data_i: dict) -> dict:
    """Rescale kpts/lines from processed to original resolution using the
    per-view `scales` (reference `export_predictions.py:44-62`)."""
    out = dict(pred)
    for i in ("0", "1", ""):
        view = data_i.get(f"view{i}", data_i if i == "" else {})
        scales = view.get("scales")
        if scales is None:
            continue
        s = np.asarray(scales)
        for key in (f"keypoints{i}", f"lines{i}", f"orig_lines{i}"):
            if key in out:
                out[key] = out[key] / s.reshape(*([1] * (out[key].ndim - 1)), 2)
    return out


def _index_remap(mask: np.ndarray) -> np.ndarray:
    """old index -> new index after dropping masked entries (-1 for dropped)."""
    remap = np.full(len(mask), -1, np.int64)
    remap[mask] = np.arange(int(mask.sum()))
    return remap


def _remap_matches(matches: np.ndarray, remap_other: np.ndarray) -> np.ndarray:
    """Remap match target indices after the other view was trimmed;
    special values (-1 unmatched, -2 ignore) pass through."""
    out = matches.copy()
    valid = matches >= 0
    out[valid] = remap_other[matches[valid]]
    return out


def trim_masked(pred: dict) -> dict:
    """Drop padded entries using keypoint/line masks (removing the masks) and
    remap cross-view match indices so they stay consistent."""
    out = dict(pred)
    # unsuffixed single-view features (feature-export path)
    mask_u = out.pop("keypoint_mask", None)
    if mask_u is not None:
        mask_u = np.asarray(mask_u).astype(bool)
        for key in ("keypoints", "keypoint_scores", "descriptors", "scales", "oris"):
            if key in out and np.asarray(out[key]).shape[:1] == mask_u.shape:
                out[key] = np.asarray(out[key])[mask_u]
    lmask_u = out.pop("line_mask", None)
    if lmask_u is not None:
        lmask_u = np.asarray(lmask_u).astype(bool)
        for key in ("lines", "line_scores", "orig_lines"):
            if key in out and np.asarray(out[key]).shape[:1] == lmask_u.shape:
                out[key] = np.asarray(out[key])[lmask_u]
    masks = {i: out.pop(f"keypoint_mask{i}", None) for i in ("0", "1")}
    lmasks = {i: out.pop(f"line_mask{i}", None) for i in ("0", "1")}
    masks = {i: None if m is None else np.asarray(m).astype(bool) for i, m in masks.items()}
    lmasks = {i: None if m is None else np.asarray(m).astype(bool) for i, m in lmasks.items()}
    for i, other in (("0", "1"), ("1", "0")):
        mask = masks[i]
        if mask is None:
            continue
        # remap match targets into the other view's trimmed indexing
        if masks[other] is not None:
            remap_other = _index_remap(masks[other])
            for key in (f"matches{i}", f"gt_matches{i}"):
                if key in out:
                    out[key] = _remap_matches(np.asarray(out[key]), remap_other)
        for key in (f"keypoints{i}", f"keypoint_scores{i}", f"descriptors{i}",
                    f"matches{i}", f"gt_matches{i}", f"matching_scores{i}",
                    f"scales{i}", f"oris{i}"):
            if key in out and np.asarray(out[key]).shape[:1] == mask.shape:
                out[key] = np.asarray(out[key])[mask]
        lmask = lmasks[i]
        if lmask is not None:
            if lmasks[other] is not None:
                remap_lother = _index_remap(lmasks[other])
                for key in (f"line_matches{i}", f"gt_line_matches{i}"):
                    if key in out:
                        out[key] = _remap_matches(np.asarray(out[key]), remap_lother)
            for key in (f"lines{i}", f"line_scores{i}", f"orig_lines{i}",
                        f"line_matches{i}", f"gt_line_matches{i}",
                        f"line_matching_scores{i}"):
                if key in out and np.asarray(out[key]).shape[:1] == lmask.shape:
                    out[key] = np.asarray(out[key])[lmask]
    return out


def _index_tree(tree, b: int):
    """Take the b-th item of every leaf (arrays AND lists, e.g. `name`)."""
    if isinstance(tree, dict):
        return {k: _index_tree(v, b) for k, v in tree.items()}
    if isinstance(tree, np.ndarray):
        return tree[b]
    if isinstance(tree, (list, tuple)):
        return tree[b]
    return tree


def _split_items(batch: dict):
    """Split a collated batch (leading dim B) into B unbatched item dicts."""
    sizes = [
        len(v)
        for v in batch.values()
        if isinstance(v, (np.ndarray, list)) and not isinstance(v, str)
    ]
    bsz = sizes[0] if sizes else 1
    as_np = map_tensor(batch, np.asarray)  # convert leaves once, not per item
    return [_index_tree(as_np, b) for b in range(bsz)]


def _group_collate(items: list[dict]):
    """Re-collate unbatched item dicts into one batch. Items in a group share
    shapes by construction (`_shape_signature` bucketing)."""
    elem = items[0]
    if isinstance(elem, dict):
        return {k: _group_collate([it[k] for it in items]) for k in elem}
    if isinstance(elem, (str, bytes)):
        return list(items)
    if isinstance(elem, np.ndarray) or np.isscalar(elem):
        return np.stack([np.asarray(it) for it in items], axis=0)
    return list(items)


def _shape_signature(item) -> tuple:
    """Hashable signature of every array leaf's shape+dtype. Grouping only
    same-signature items keeps grouped results BIT-identical to per-item
    dispatch: zero-padding mixed resolutions instead would change the conv
    spatial dims and therefore XLA's reduction orders, flipping the rank of
    near-tied detection scores (measured: same-shape batching is exact, mixed
    pad+mask is not). Bucketing also adds no compilations beyond what
    per-item dispatch already pays per distinct shape."""
    if isinstance(item, dict):
        return tuple((k, _shape_signature(v)) for k, v in sorted(item.items()))
    if isinstance(item, np.ndarray):
        return (item.shape, str(item.dtype))
    return type(item).__name__


def export_predictions(
    loader,
    apply_fn,
    output_file: Path,
    as_half: bool = False,
    keys: str | list = "*",
    callback_fn=None,
    trim_masks: bool = True,
    items_per_dispatch: int | None = None,
):
    """Run `apply_fn(prepared_batch) -> pred (numpy dict, batched)` over the
    loader and cache results. apply_fn owns jit/device placement.

    `items_per_dispatch` groups that many same-shape items (bucketed by
    `_shape_signature`) into one batch per device dispatch (reference loop-1
    semantics are per-item, `export_predictions.py:17-81`; grouping amortizes
    the per-dispatch round-trip of relayed TPUs — cf. training's
    `steps_per_dispatch`). The written cache is item-for-item BIT-identical
    to per-item dispatch (same-shape batching does not change XLA numerics):
    results are unbatched, masked slots trimmed, and keypoints un-scaled per
    item. Trailing partial buckets are padded by repeating the last item
    (compile count stays at one per distinct shape); the duplicates' outputs
    are dropped. The default (None) dispatches each loader batch as-is.
    Combine with `preprocessing.pad_to_multiple` (or a fixed resize) to keep
    the number of shape buckets small.
    """
    output_file = Path(output_file)
    output_file.parent.mkdir(exist_ok=True, parents=True)
    buckets: dict[tuple, list] = {}
    n_written = 0

    def flush(group, hfile):
        nonlocal n_written
        n_real = len(group)
        if n_real == 0:
            return
        pad_to = items_per_dispatch or n_real
        batch = _group_collate(group + [group[-1]] * (pad_to - n_real))
        pred = apply_fn(prepare_batch(batch))
        pred = map_tensor(pred, np.asarray)
        for b in range(n_real):
            item = group[b]
            pred_b = map_tensor(pred, lambda x: x[b])
            data_b = {
                k: v for k, v in item.items()
                if k.startswith("view") or k == "scales"
            }
            if keys != "*":
                pred_b = {k: v for k, v in pred_b.items() if k in keys}
            if callback_fn is not None:
                pred_b = {**callback_fn(pred_b, item), **pred_b}
            if trim_masks:
                pred_b = trim_masked(pred_b)
            pred_b = unscale_keypoints(pred_b, data_b)
            if as_half:
                for k, v in pred_b.items():
                    if isinstance(v, np.ndarray) and v.dtype == np.float32:
                        pred_b[k] = v.astype(np.float16)
            name = item.get("name", str(n_written))
            try:
                grp = hfile.create_group(str(name))
            except ValueError:
                grp = hfile.create_group(f"{name}_{n_written}")
            for k, v in pred_b.items():
                if isinstance(v, np.ndarray):
                    grp.create_dataset(k, data=v)
            if n_written % 50 == 0:
                logger.info("Exported %d items", n_written)
            n_written += 1

    gsize = items_per_dispatch
    with h5py.File(str(output_file), "w") as hfile:
        for batch in loader:
            items = _split_items(batch)
            if gsize is None:  # dispatch loader batches as-is
                flush(items, hfile)
                continue
            for item in items:
                bucket = buckets.setdefault(_shape_signature(item), [])
                bucket.append(item)
                if len(bucket) >= gsize:
                    flush(bucket, hfile)
                    bucket.clear()
        for bucket in buckets.values():
            flush(bucket, hfile)
    return output_file


def load_prediction(hfile: h5py.File, name: str) -> dict:
    grp = hfile[str(name)]
    return {k: np.asarray(grp[k]) for k in grp.keys()}
