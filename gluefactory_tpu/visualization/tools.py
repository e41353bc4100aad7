"""Pluggable per-pair plot modes for the interactive viewer (role of
reference `visualization/tools.py:140-568`): keypoints, keypoint
ranking/scores, heatmaps, matches, matching scores, line matches, GT
matches (points + lines), homography/reprojection error, epipolar lines.

Each tool is a callable `tool(fig, axes, data, pred)` drawing ONE
experiment's prediction onto one row of axes; `required_keys` lists the
pred/data keys the mode needs (the viewer filters its mode list by them,
reference `two_view_frame.py:45-53`). Registered in `__plot_dict__`
(points) or `__plot_lines_dict__` (lines).
"""

from __future__ import annotations

import matplotlib.pyplot as plt
import numpy as np

from ..geometry.homography import sym_homography_error
from .viz2d import (
    cm_ranking,
    cm_RdGn,
    plot_color_line_matches,
    plot_heatmaps,
    plot_keypoints,
    plot_lines,
    plot_matches,
)


def _tool(*required_keys):
    """Attach `required_keys` metadata to a plot-mode function."""

    def wrap(fn):
        fn.required_keys = list(required_keys)
        return fn

    return wrap


class RadioHideTool:
    """Keyboard/radio switcher between registered plot modes."""

    def __init__(self, fig, axes, data, preds, plot_dict, default="keypoints"):
        self.fig = fig
        self.axes = axes  # list of rows (one per experiment)
        self.data = data
        self.preds = preds  # {name: pred}
        self.plot_dict = plot_dict
        # background imshow artists present before any mode draws (color +
        # optional depth overlay) — clear() keeps exactly these
        self._n_base_images = {
            id(ax): len(ax.images) for row in self.axes for ax in row
        }
        self.current = default if default in plot_dict else next(iter(plot_dict))
        self.draw(self.current)

    def clear(self):
        for row in self.axes:
            for ax in row:
                for li in list(ax.lines):
                    li.remove()
                for c in list(ax.collections):
                    c.remove()
                for im in list(ax.images)[self._n_base_images.get(id(ax), 1):]:
                    im.remove()
        self.fig.artists.clear()

    def draw(self, name):
        self.clear()
        tool = self.plot_dict[name]
        for row, pred in zip(self.axes, self.preds.values()):
            tool(self.fig, row, self.data, pred)
        self.current = name
        self.fig.canvas.draw_idle()


def _matched(pred):
    m0 = np.asarray(pred["matches0"])
    valid = m0 > -1
    k0 = np.asarray(pred["keypoints0"])[valid]
    k1 = np.asarray(pred["keypoints1"])[m0[valid]]
    return k0, k1, valid


@_tool("view0", "view1")
def plot_images_tool(fig, axes, data, pred):
    """Bare images (reference ImagePlot)."""


@_tool("keypoints0", "keypoints1")
def plot_keypoints_tool(fig, axes, data, pred):
    plot_keypoints(
        [pred["keypoints0"], pred["keypoints1"]], axes=axes, colors="royalblue"
    )


@_tool("keypoints0", "keypoints1", "keypoint_scores0", "keypoint_scores1")
def plot_keypoint_ranking_tool(fig, axes, data, pred):
    """Keypoints colored by score RANK (reference KeypointRankingPlot)."""
    sc0 = np.asarray(pred["keypoint_scores0"])
    sc1 = np.asarray(pred["keypoint_scores1"])
    plot_keypoints(
        [pred["keypoints0"], pred["keypoints1"]],
        axes=axes,
        colors=[cm_ranking(sc0), cm_ranking(sc1)],
    )


@_tool("keypoints0", "keypoints1", "keypoint_scores0", "keypoint_scores1")
def plot_keypoint_scores_tool(fig, axes, data, pred):
    """Keypoints colored red->green by raw score (reference KeypointScoresPlot)."""
    sc0 = np.asarray(pred["keypoint_scores0"])
    sc1 = np.asarray(pred["keypoint_scores1"])
    plot_keypoints(
        [pred["keypoints0"], pred["keypoints1"]],
        axes=axes,
        colors=[cm_RdGn(sc0), cm_RdGn(sc1)],
    )


@_tool("dense_score_map0", "dense_score_map1")
def plot_heatmaps_tool(fig, axes, data, pred):
    """Dense detector score maps (reference HeatmapPlot; our extractors emit
    `dense_score_map` under `dense_outputs: true`)."""

    def prep(h):
        h = np.asarray(h, np.float32)
        h = h[0] if h.ndim == 3 and h.shape[0] == 1 else h
        return 1.0 / (1.0 + np.exp(-h)) if h.min() < 0.0 else h

    plot_heatmaps(
        [prep(pred["dense_score_map0"]), prep(pred["dense_score_map1"])],
        axes=axes,
        cmap="rainbow",
    )


@_tool("keypoints0", "keypoints1", "matches0")
def plot_matches_tool(fig, axes, data, pred):
    k0, k1, _ = _matched(pred)
    plot_matches(k0, k1, color="lime", axes=axes, a=0.5)


@_tool("keypoints0", "keypoints1", "matches0", "matching_scores0")
def plot_matching_scores_tool(fig, axes, data, pred):
    """Matches colored by confidence (reference MatchScoresPlot)."""
    k0, k1, _ = _matched(pred)
    scores = np.asarray(pred["matching_scores0"])[np.asarray(pred["matches0"]) > -1]
    colors = plt.cm.viridis(scores).tolist()
    plot_matches(k0, k1, color=colors, axes=axes, a=0.5)


@_tool("keypoints0", "keypoints1", "matches0", "gt_matches0")
def plot_gt_matches_tool(fig, axes, data, pred):
    gt = np.asarray(pred.get("gt_matches0", data.get("gt_matches0")))
    m0 = np.asarray(pred["matches0"])
    valid = m0 > -1
    correct = (m0 == gt)[valid]
    k0 = np.asarray(pred["keypoints0"])[valid]
    k1 = np.asarray(pred["keypoints1"])[m0[valid]]
    plot_matches(k0, k1, color=cm_RdGn(correct).tolist(), axes=axes, a=0.5)


@_tool("keypoints0", "keypoints1", "matches0", "H_0to1")
def plot_homography_error_tool(fig, axes, data, pred):
    import jax.numpy as jnp

    k0, k1, _ = _matched(pred)
    if len(k0) == 0:
        return
    err = np.asarray(
        sym_homography_error(
            jnp.asarray(k0[None]),
            jnp.asarray(k1[None]),
            jnp.asarray(np.asarray(data["H_0to1"])[None]),
        )
    )[0]
    correct = err < 3.0
    plot_matches(k0, k1, color=cm_RdGn(correct).tolist(), axes=axes, a=0.5)


@_tool("keypoints0", "keypoints1", "matches0", "T_0to1")
def plot_reprojection_error_tool(fig, axes, data, pred):
    """Matches colored by depth-reprojection correctness (reference
    ReprojectionMatchesPlot, tools.py:441-465)."""
    import jax
    import jax.numpy as jnp

    from ..geometry.depth import symmetric_reprojection_error

    if "depth" not in data.get("view0", {}):
        return
    k0, k1, _ = _matched(pred)
    if len(k0) == 0:
        return
    batch1 = lambda t: jax.tree.map(lambda x: jnp.asarray(np.asarray(x))[None], t)
    err, valid = symmetric_reprojection_error(
        jnp.asarray(k0[None]),
        jnp.asarray(k1[None]),
        batch1(data["view0"]["camera"]),
        batch1(data["view1"]["camera"]),
        batch1(data["T_0to1"]),
        jnp.asarray(np.asarray(data["view0"]["depth"])[None]),
        jnp.asarray(np.asarray(data["view1"]["depth"])[None]),
    )
    correct = (np.asarray(err)[0] < 3.0) & np.asarray(valid)[0]
    plot_matches(k0, k1, color=cm_RdGn(correct).tolist(), axes=axes, a=0.5)


@_tool("keypoints0", "keypoints1", "matches0", "T_0to1")
def plot_epipolar_tool(fig, axes, data, pred):
    from ..eval.utils import pose_to_E
    from .viz2d import plot_epipolar_lines

    cam0 = data["view0"]["camera"]
    cam1 = data["view1"]["camera"]
    E = pose_to_E(data["T_0to1"])
    K0 = np.asarray(cam0.calibration_matrix())
    K1 = np.asarray(cam1.calibration_matrix())
    F = np.linalg.inv(K1).T @ E @ np.linalg.inv(K0)
    k0, k1, _ = _matched(pred)
    plot_epipolar_lines(k0[:30], k1[:30], F, axes=axes)


@_tool("lines0", "lines1")
def plot_lines_tool(fig, axes, data, pred):
    plot_lines([pred["lines0"], pred["lines1"]], axes=list(axes))


@_tool("lines0", "lines1", "line_matches0")
def plot_line_matches_tool(fig, axes, data, pred):
    m0 = np.asarray(pred["line_matches0"])
    valid = m0 > -1
    l0 = np.asarray(pred["lines0"])[valid]
    l1 = np.asarray(pred["lines1"])[m0[valid]]
    plot_color_line_matches([l0, l1], axes=list(axes))


@_tool("lines0", "lines1", "line_matches0", "line_gt_matches0")
def plot_gt_line_matches_tool(fig, axes, data, pred):
    """Line matches colored by GT correctness (reference GtLineMatchesPlot)."""
    gt = np.asarray(pred.get("line_gt_matches0", data.get("line_gt_matches0")))
    m0 = np.asarray(pred["line_matches0"])
    valid = m0 > -1
    correct = (m0 == gt)[valid]
    l0 = np.asarray(pred["lines0"])[valid]
    l1 = np.asarray(pred["lines1"])[m0[valid]]
    plot_color_line_matches([l0, l1], correct_matches=correct, axes=list(axes))


__plot_dict__ = {
    "images": plot_images_tool,
    "keypoints": plot_keypoints_tool,
    "keypoint_ranking": plot_keypoint_ranking_tool,
    "keypoint_scores": plot_keypoint_scores_tool,
    "heatmaps": plot_heatmaps_tool,
    "matches": plot_matches_tool,
    "matching_scores": plot_matching_scores_tool,
    "gt_matches": plot_gt_matches_tool,
    "homography_error": plot_homography_error_tool,
    "depth_matches": plot_reprojection_error_tool,
    "epipolar_lines": plot_epipolar_tool,
}

__plot_lines_dict__ = {
    "lines": plot_lines_tool,
    "line_matches": plot_line_matches_tool,
    "gt_line_matches": plot_gt_line_matches_tool,
}
