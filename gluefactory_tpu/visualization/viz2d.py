"""2D visualization primitives (role of reference `visualization/viz2d.py`):
image grids, keypoints, matches, epipolar lines, heatmaps, line segments,
color line matches, cumulative error curves.

All functions take numpy arrays (HWC float images in [0,1]) and matplotlib
axes; device arrays should be `np.asarray`ed by the caller.
"""

from __future__ import annotations

import matplotlib
import matplotlib.pyplot as plt
import numpy as np


def cm_RdGn(x):
    """Red-green colormap for correctness coloring: 0 -> red, 1 -> green."""
    x = np.clip(np.asarray(x, float), 0, 1)[..., None] * 2
    c = x * np.array([[0.0, 1.0, 0.0]]) + (2 - x) * np.array([[1.0, 0.0, 0.0]])
    return np.clip(c, 0, 1)


def cm_ranking(sc, ths=(512, 1024, 2048, 4096)):
    """Color points by score-rank tier (reference viz2d.py:16-26): for the
    usual score-sorted (top-k) input the `ths[0]` best points are red, the
    next tiers yellow / lime / cyan, and everything past the last threshold
    blue. Reference-faithful detail: tiers are assigned by array index and
    then reordered score-descending, which only equals tier-by-rank when the
    input is already sorted.

    Thresholds must be increasing. Ranks beyond the fifth tier (only possible
    when more than four thresholds are passed) fall back to gray, matching the
    reference's five-color table.
    """
    sc = np.asarray(sc)
    palette = np.array(["red", "yellow", "lime", "cyan", "blue", "gray"])
    tier = np.searchsorted(np.asarray(ths), np.arange(sc.shape[0]), side="right")
    by_rank = palette[np.minimum(tier, len(palette) - 1)]
    return by_rank[np.argsort(sc, axis=0)[::-1]]


def plot_images(imgs, titles=None, cmaps="gray", dpi=100, pad=0.5, adaptive=True):
    """Plot images side by side; returns the axes."""
    n = len(imgs)
    if not isinstance(cmaps, (list, tuple)):
        cmaps = [cmaps] * n
    imgs = [np.asarray(im) for im in imgs]
    ratios = [im.shape[1] / im.shape[0] for im in imgs] if adaptive else [4 / 3] * n
    figsize = [sum(ratios) * 4.5, 4.5]
    fig, ax = plt.subplots(1, n, figsize=figsize, dpi=dpi, gridspec_kw={"width_ratios": ratios})
    if n == 1:
        ax = [ax]
    for i in range(n):
        img = imgs[i]
        if img.ndim == 3 and img.shape[-1] == 1:
            img = img[..., 0]
        ax[i].imshow(img, cmap=plt.get_cmap(cmaps[i]))
        ax[i].set_axis_off()
        if titles:
            ax[i].set_title(titles[i])
    fig.tight_layout(pad=pad)
    return ax


def plot_image_grid(imgs, titles=None, cmaps="gray", dpi=100, pad=0.5,
                    return_fig=False):
    """Plot a grid of image rows; returns the grid of axes (and the figure
    with `return_fig=True`, reference viz2d.py plot_image_grid)."""
    n_rows = len(imgs)
    n_cols = len(imgs[0])
    figsize = [n_cols * 4.5, n_rows * 4.5]
    fig, ax = plt.subplots(n_rows, n_cols, figsize=figsize, dpi=dpi, squeeze=False)
    for r in range(n_rows):
        for c in range(n_cols):
            img = np.asarray(imgs[r][c])
            if img.ndim == 3 and img.shape[-1] == 1:
                img = img[..., 0]
            ax[r][c].imshow(img, cmap=plt.get_cmap(cmaps if isinstance(cmaps, str) else cmaps[c]))
            ax[r][c].set_axis_off()
            if titles:
                ax[r][c].set_title(titles[r][c])
    fig.tight_layout(pad=pad)
    if return_fig:
        return fig, ax
    return ax


def add_text(idx, text, axes=None, pos=(0.01, 0.99), fs=15, color="w",
             lcolor="k", lwidth=2, ha="left", va="top", visible=True):
    """Outlined text on axis `idx` of `axes` (reference viz2d.py add_text)."""
    import matplotlib.patheffects as path_effects

    if axes is None:
        axes = plt.gcf().axes
    ax = axes[idx] if not hasattr(axes, "ndim") else axes.ravel()[idx]
    t = ax.text(
        *pos, text, fontsize=fs, ha=ha, va=va, color=color,
        transform=ax.transAxes, visible=visible,
    )
    if lcolor is not None:
        t.set_path_effects(
            [
                path_effects.Stroke(linewidth=lwidth, foreground=lcolor),
                path_effects.Normal(),
            ]
        )
    return t


def plot_keypoints(kpts, colors="lime", ps=4, axes=None, a=1.0):
    if axes is None:
        axes = plt.gcf().axes
    if not isinstance(colors, list):
        colors = [colors] * len(kpts)
    for ax, k, c in zip(axes, kpts, colors):
        k = np.asarray(k)
        ax.scatter(k[:, 0], k[:, 1], c=c, s=ps, linewidths=0, alpha=a)


def plot_matches(kpts0, kpts1, color=None, lw=1.5, ps=4, a=1.0, axes=None):
    """Plot match lines across two adjacent axes."""
    fig = plt.gcf()
    if axes is None:
        ax0, ax1 = fig.axes[:2]
    else:
        ax0, ax1 = axes
    kpts0 = np.asarray(kpts0)
    kpts1 = np.asarray(kpts1)
    if color is None:
        color = matplotlib.cm.hsv(np.random.rand(len(kpts0))).tolist()
    elif not isinstance(color, (list, np.ndarray)):
        color = [color] * len(kpts0)
    if lw > 0:
        for i in range(len(kpts0)):
            con = matplotlib.patches.ConnectionPatch(
                xyA=(kpts0[i, 0], kpts0[i, 1]),
                xyB=(kpts1[i, 0], kpts1[i, 1]),
                coordsA=ax0.transData,
                coordsB=ax1.transData,
                axesA=ax0,
                axesB=ax1,
                zorder=1,
                color=color[i] if not isinstance(color[i], str) or True else color[i],
                linewidth=lw,
                alpha=a,
            )
            fig.add_artist(con)
    if ps > 0:
        ax0.scatter(kpts0[:, 0], kpts0[:, 1], c=color, s=ps)
        ax1.scatter(kpts1[:, 0], kpts1[:, 1], c=color, s=ps)


def plot_lines(lines_per_axis, line_colors="orange", point_colors="cyan",
               ps=4, lw=2, alpha=1.0, indices=(0, 1), axes=None):
    """Plot line segments (N, 2, 2) on existing axes."""
    if not isinstance(line_colors, list):
        line_colors = [line_colors] * len(lines_per_axis)
    if not isinstance(point_colors, list):
        point_colors = [point_colors] * len(lines_per_axis)
    if axes is None:
        axes = [plt.gcf().axes[i] for i in indices]
    for ax, l, lc, pc in zip(axes, lines_per_axis, line_colors, point_colors):
        l = np.asarray(l)
        for seg in l:
            ax.plot((seg[0, 0], seg[1, 0]), (seg[0, 1], seg[1, 1]), c=lc, linewidth=lw, alpha=alpha)
        pts = l.reshape(-1, 2)
        ax.scatter(pts[:, 0], pts[:, 1], c=pc, s=ps, linewidths=0, zorder=2, alpha=alpha)


def plot_color_line_matches(lines_per_axis, correct_matches=None, lw=2,
                            indices=(0, 1), axes=None):
    """Color-code matched line pairs consistently across the two images;
    with `correct_matches` color by GT correctness instead (green/red)."""
    n_lines = len(np.asarray(lines_per_axis[0]))
    if correct_matches is not None:
        colors = cm_RdGn(np.asarray(correct_matches, float))
    else:
        colors = matplotlib.cm.hsv(np.linspace(0, 1, n_lines))
        np.random.RandomState(0).shuffle(colors)
    if axes is None:
        axes = [plt.gcf().axes[i] for i in indices]
    for ax, l in zip(axes, lines_per_axis):
        l = np.asarray(l)
        for i, seg in enumerate(l):
            ax.plot((seg[0, 0], seg[1, 0]), (seg[0, 1], seg[1, 1]), c=colors[i], linewidth=lw)


def plot_heatmaps(heatmaps, vmin=0.0, vmax=None, cmap="Spectral", a=0.5, axes=None):
    if axes is None:
        axes = plt.gcf().axes
    for ax, h in zip(axes, heatmaps):
        h = np.asarray(h, float)
        ax.imshow(h, alpha=a, vmin=vmin, vmax=vmax, cmap=cmap)


def plot_epipolar_lines(pts0, pts1, F, axes=None, color="orange", lw=1.0):
    """Draw the epipolar lines of pts0 in image 1 (and vice versa)."""
    if axes is None:
        axes = plt.gcf().axes[:2]
    ax0, ax1 = axes

    def draw(ax, lines):
        xlim = ax.get_xlim()
        for a_, b_, c_ in lines:
            if abs(b_) > 1e-8:
                x = np.array(xlim)
                y = -(a_ * x + c_) / b_
                ax.plot(x, y, c=color, linewidth=lw, alpha=0.6)
        ax.set_xlim(xlim)

    pts0_h = np.concatenate([pts0, np.ones((len(pts0), 1))], 1)
    pts1_h = np.concatenate([pts1, np.ones((len(pts1), 1))], 1)
    draw(ax1, pts0_h @ np.asarray(F).T)
    draw(ax0, pts1_h @ np.asarray(F))


def plot_cumulative(errors: dict, x_limits, unit="px", title=""):
    """Cumulative error curves (reference viz2d.plot_cumulative)."""
    fig, ax = plt.subplots(figsize=[5, 8])
    for name, errs in errors.items():
        errs = np.sort(np.asarray(errs, float))
        errs = errs[np.isfinite(errs)]
        if errs.size == 0:
            continue
        recall = (np.arange(len(errs)) + 1) / len(errs)
        ax.plot(errs, recall * 100, label=name)
    ax.set_xlim(x_limits)
    ax.set_ylim([0, 100])
    ax.set_xlabel(f"error ({unit})")
    ax.set_ylabel("recall (%)")
    ax.set_title(title)
    ax.legend()
    ax.grid(alpha=0.3)
    return fig


def save_plot(path, **kw):
    plt.savefig(path, bbox_inches="tight", pad_inches=0, **kw)
