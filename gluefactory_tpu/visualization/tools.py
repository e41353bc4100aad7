"""Pluggable per-pair plot modes for the interactive viewer (role of
reference `visualization/tools.py:140-568`): keypoints, matches,
line matches, GT matches, epipolar lines, homography-error coloring.

Each tool is a callable `tool(fig, axes, data, preds)` registered in
`__plot_dict__` (points) or `__plot_lines_dict__` (lines); the viewer builds
its radio buttons from these registries, so downstream code can add modes.
"""

from __future__ import annotations

import matplotlib.pyplot as plt
import numpy as np

from ..geometry.homography import sym_homography_error
from .viz2d import (
    cm_RdGn,
    plot_color_line_matches,
    plot_keypoints,
    plot_lines,
    plot_matches,
)


class RadioHideTool:
    """Keyboard/radio switcher between registered plot modes."""

    def __init__(self, fig, axes, data, preds, plot_dict, default="keypoints"):
        self.fig = fig
        self.axes = axes
        self.data = data
        self.preds = preds
        self.plot_dict = plot_dict
        self.artists = []
        self.current = default if default in plot_dict else next(iter(plot_dict))
        self.draw(self.current)

    def clear(self):
        for a in self.artists:
            try:
                a.remove()
            except Exception:
                pass
        self.artists = []

    def draw(self, name):
        self.clear()
        n_before = len(self.fig.artists)
        self.plot_dict[name](self.fig, self.axes, self.data, self.preds)
        self.artists = self.fig.artists[n_before:]
        self.current = name
        self.fig.canvas.draw_idle()


def _matched(pred):
    m0 = np.asarray(pred["matches0"])
    valid = m0 > -1
    k0 = np.asarray(pred["keypoints0"])[valid]
    k1 = np.asarray(pred["keypoints1"])[m0[valid]]
    return k0, k1, valid


def plot_keypoints_tool(fig, axes, data, pred):
    plot_keypoints(
        [pred["keypoints0"], pred["keypoints1"]], axes=axes, colors="royalblue"
    )


def plot_matches_tool(fig, axes, data, pred):
    k0, k1, _ = _matched(pred)
    scores = np.asarray(pred["matching_scores0"])[np.asarray(pred["matches0"]) > -1]
    colors = plt.cm.viridis(scores).tolist()
    plot_matches(k0, k1, color=colors, axes=axes, a=0.5)


def plot_gt_matches_tool(fig, axes, data, pred):
    if "gt_matches0" not in pred and "gt_matches0" not in data:
        return
    gt = np.asarray(pred.get("gt_matches0", data.get("gt_matches0")))
    m0 = np.asarray(pred["matches0"])
    valid = m0 > -1
    correct = (m0 == gt)[valid]
    k0 = np.asarray(pred["keypoints0"])[valid]
    k1 = np.asarray(pred["keypoints1"])[m0[valid]]
    plot_matches(k0, k1, color=cm_RdGn(correct).tolist(), axes=axes, a=0.5)


def plot_homography_error_tool(fig, axes, data, pred):
    if "H_0to1" not in data:
        return
    import jax.numpy as jnp

    k0, k1, _ = _matched(pred)
    if len(k0) == 0:
        return
    err = np.asarray(
        sym_homography_error(
            jnp.asarray(k0[None]), jnp.asarray(k1[None]), jnp.asarray(np.asarray(data["H_0to1"])[None])
        )
    )[0]
    correct = err < 3.0
    plot_matches(k0, k1, color=cm_RdGn(correct).tolist(), axes=axes, a=0.5)


def plot_epipolar_tool(fig, axes, data, pred):
    if "T_0to1" not in data:
        return
    from ..eval.utils import pose_to_E

    cam0 = data["view0"]["camera"]
    cam1 = data["view1"]["camera"]
    E = pose_to_E(data["T_0to1"])
    K0 = np.asarray(cam0.calibration_matrix())
    K1 = np.asarray(cam1.calibration_matrix())
    F = np.linalg.inv(K1).T @ E @ np.linalg.inv(K0)
    k0, k1, _ = _matched(pred)
    from .viz2d import plot_epipolar_lines

    plot_epipolar_lines(k0[:30], k1[:30], F, axes=axes)


def plot_lines_tool(fig, axes, data, pred):
    if "lines0" not in pred:
        return
    plot_lines([pred["lines0"], pred["lines1"]])


def plot_line_matches_tool(fig, axes, data, pred):
    if "line_matches0" not in pred:
        return
    m0 = np.asarray(pred["line_matches0"])
    valid = m0 > -1
    l0 = np.asarray(pred["lines0"])[valid]
    l1 = np.asarray(pred["lines1"])[m0[valid]]
    plot_color_line_matches([l0, l1])


__plot_dict__ = {
    "keypoints": plot_keypoints_tool,
    "matches": plot_matches_tool,
    "gt_matches": plot_gt_matches_tool,
    "homography_error": plot_homography_error_tool,
    "epipolar_lines": plot_epipolar_tool,
}

__plot_lines_dict__ = {
    "lines": plot_lines_tool,
    "line_matches": plot_line_matches_tool,
}
