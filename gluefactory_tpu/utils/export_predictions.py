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


def export_predictions(
    loader,
    apply_fn,
    output_file: Path,
    as_half: bool = False,
    keys: str | list = "*",
    callback_fn=None,
    trim_masks: bool = True,
):
    """Run `apply_fn(prepared_batch) -> pred (numpy dict, unbatched)` over the
    loader and cache results. apply_fn owns jit/device placement."""
    output_file = Path(output_file)
    output_file.parent.mkdir(exist_ok=True, parents=True)
    with h5py.File(str(output_file), "w") as hfile:
        for i, batch in enumerate(loader):
            prepared = prepare_batch(batch)
            pred = apply_fn(prepared)
            # unbatch
            pred = map_tensor(pred, lambda x: np.asarray(x)[0])
            data_i = map_tensor(
                {k: v for k, v in batch.items() if k.startswith("view") or k == "scales"},
                lambda x: np.asarray(x)[0],
            )
            if keys != "*":
                pred = {k: v for k, v in pred.items() if k in keys}
            if callback_fn is not None:
                pred = {**callback_fn(pred, map_tensor(batch, lambda x: np.asarray(x)[0])), **pred}
            if trim_masks:
                pred = trim_masked(pred)
            pred = unscale_keypoints(pred, data_i)
            if as_half:
                for k, v in pred.items():
                    if isinstance(v, np.ndarray) and v.dtype == np.float32:
                        pred[k] = v.astype(np.float16)
            name = batch["name"][0] if "name" in batch else str(i)
            try:
                grp = hfile.create_group(str(name))
            except ValueError:
                grp = hfile.create_group(f"{name}_{i}")
            for k, v in pred.items():
                if isinstance(v, np.ndarray):
                    grp.create_dataset(k, data=v)
            if i % 50 == 0:
                logger.info("Exported %d items", i)
    return output_file


def load_prediction(hfile: h5py.File, name: str) -> dict:
    grp = hfile[str(name)]
    return {k: np.asarray(grp[k]) for k in grp.keys()}
