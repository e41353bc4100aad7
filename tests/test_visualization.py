"""Smoke tests for the visualization layer (Agg backend)."""

import matplotlib

matplotlib.use("Agg")

import matplotlib.pyplot as plt
import numpy as np


def test_viz2d_roundtrip(tmp_path):
    from gluefactory_tpu.visualization.viz2d import (
        cm_RdGn,
        plot_cumulative,
        plot_images,
        plot_keypoints,
        plot_lines,
        plot_matches,
        save_plot,
    )

    rng = np.random.default_rng(0)
    imgs = [rng.uniform(0, 1, (60, 80, 3)), rng.uniform(0, 1, (60, 80, 3))]
    plot_images(imgs, titles=["a", "b"])
    kpts = [rng.uniform(0, 60, (20, 2)), rng.uniform(0, 60, (20, 2))]
    plot_keypoints(kpts)
    plot_matches(kpts[0][:10], kpts[1][:10], color=cm_RdGn(np.ones(10)).tolist())
    lines = [rng.uniform(0, 60, (5, 2, 2)), rng.uniform(0, 60, (5, 2, 2))]
    plot_lines(lines)
    save_plot(tmp_path / "fig.png")
    assert (tmp_path / "fig.png").exists()
    plt.close("all")

    fig = plot_cumulative({"a": rng.uniform(0, 10, 100)}, [0, 10])
    fig.savefig(tmp_path / "cum.png")
    plt.close("all")


def test_make_match_figures():
    from gluefactory_tpu.visualization.visualize_batch import make_match_figures

    rng = np.random.default_rng(1)
    B, N = 2, 12
    pred = {
        "keypoints0": rng.uniform(0, 60, (B, N, 2)).astype(np.float32),
        "keypoints1": rng.uniform(0, 60, (B, N, 2)).astype(np.float32),
        "matches0": rng.integers(-1, N, (B, N)),
        "gt_matches0": rng.integers(-1, N, (B, N)),
    }
    data = {
        "view0": {"image": rng.uniform(0, 1, (B, 60, 80, 3)).astype(np.float32)},
        "view1": {"image": rng.uniform(0, 1, (B, 60, 80, 3)).astype(np.float32)},
    }
    figs = make_match_figures(pred, data, n_pairs=2)
    assert len(figs) == 2
    plt.close("all")


def test_global_frame_interactivity():
    """GlobalFrame: draw, metric cycling, diff mode, hover scaffolding."""
    from gluefactory_tpu.visualization.global_frame import GlobalFrame

    n = 10
    rng = np.random.default_rng(0)
    results = {
        "expA": {
            "names": [f"pair{i}" for i in range(n)],
            "prec": rng.uniform(0, 1, n),
            "num_matches": rng.integers(10, 100, n).astype(float),
        },
        "expB": {
            "names": [f"pair{i}" for i in range(n)],
            "prec": rng.uniform(0, 1, n),
            "num_matches": rng.integers(10, 100, n).astype(float),
        },
    }
    frame = GlobalFrame({}, results, loader=None, predictions={})
    assert set(frame.metrics) == {"prec", "num_matches"}
    # legend carries medians
    labels = [t.get_text() for t in frame.ax.get_legend().get_texts()]
    assert any("med" in t for t in labels)

    class KeyEvent:
        def __init__(self, key):
            self.key = key

    x0 = frame.x
    frame.on_key(KeyEvent("x"))
    assert frame.x != x0
    frame.on_key(KeyEvent("X"))
    assert frame.x == x0
    assert not frame.diff
    frame.on_key(KeyEvent("d"))
    assert frame.diff
    # diff mode: expA (the base) has y identically zero
    xs, ys = frame._series("expA")
    assert np.allclose(ys, 0.0)
    xs, ys = frame._series("expB")
    assert np.allclose(
        ys, np.asarray(results["expB"][frame.y]) - np.asarray(results["expA"][frame.y])
    )
    plt.close("all")


def test_two_view_frame_multi_experiment():
    """TwoViewFrame: side-by-side rows per experiment, key-filtered plot
    modes, left/right cycling, summary toggle (reference
    two_view_frame.py:21-177)."""
    from gluefactory_tpu.visualization.two_view_frame import TwoViewFrame

    rng = np.random.default_rng(0)
    N = 16
    data = {
        "view0": {"image": rng.uniform(0, 1, (60, 80, 3)).astype(np.float32)},
        "view1": {"image": rng.uniform(0, 1, (60, 80, 3)).astype(np.float32)},
        "H_0to1": np.eye(3, dtype=np.float32),
    }

    def mk_pred():
        return {
            "keypoints0": rng.uniform(0, 60, (N, 2)).astype(np.float32),
            "keypoints1": rng.uniform(0, 60, (N, 2)).astype(np.float32),
            "keypoint_scores0": rng.uniform(0, 1, N).astype(np.float32),
            "keypoint_scores1": rng.uniform(0, 1, N).astype(np.float32),
            "matches0": rng.integers(-1, N, N),
            "matching_scores0": rng.uniform(0, 1, N).astype(np.float32),
        }

    preds = {"expA": mk_pred(), "expB": mk_pred()}
    summaries = {"expA": {"prec": 0.9}, "expB": {"prec": 0.8}}
    frame = TwoViewFrame({}, data, preds, title="pair0", summaries=summaries)

    # one row of 2 axes per experiment
    assert len(frame.axes) == 2 and len(frame.axes[0]) == 2
    # modes filtered by available keys: no lines/depth, matches available
    assert "matches" in frame.options
    assert "matching_scores" in frame.options
    assert "keypoint_scores" in frame.options
    assert "homography_error" in frame.options
    assert "heatmaps" not in frame.options
    assert frame.radio.current == "matches"

    class KeyEvent:
        def __init__(self, key):
            self.key = key

    cur = frame.radio.current
    frame.on_key(KeyEvent("right"))
    assert frame.radio.current != cur
    frame.on_key(KeyEvent("left"))
    assert frame.radio.current == cur

    assert not frame.summary_arts[0].get_visible()
    frame.on_key(KeyEvent("t"))
    assert frame.summary_arts[0].get_visible()
    plt.close("all")


def test_two_view_frame_single_pred_back_compat():
    """A bare (un-named) prediction dict still works."""
    from gluefactory_tpu.visualization.two_view_frame import TwoViewFrame

    rng = np.random.default_rng(1)
    N = 8
    data = {
        "view0": {"image": rng.uniform(0, 1, (60, 80, 3)).astype(np.float32)},
        "view1": {"image": rng.uniform(0, 1, (60, 80, 3)).astype(np.float32)},
    }
    pred = {
        "keypoints0": rng.uniform(0, 60, (N, 2)).astype(np.float32),
        "keypoints1": rng.uniform(0, 60, (N, 2)).astype(np.float32),
        "matches0": rng.integers(-1, N, N),
    }
    frame = TwoViewFrame({}, data, pred)
    assert len(frame.axes) == 1
    assert "matches" in frame.options
    plt.close("all")


def test_cm_ranking_tiers():
    """Rank-tier colors follow the reference's first-threshold-wins rule
    (reference viz2d.py:16-26): top-ths[0] red, next tiers yellow/lime/cyan,
    everything past the last threshold blue."""
    from gluefactory_tpu.visualization.viz2d import cm_ranking

    rng = np.random.RandomState(3)
    # extractor outputs are score-sorted (top-k), where index == rank and the
    # reference's index-tier-then-reorder dance reduces to tier-by-rank
    sc = np.sort(rng.rand(5000))[::-1].copy()
    out = cm_ranking(sc)
    assert (out[:512] == "red").all()
    assert (out[512:1024] == "yellow").all()
    assert (out[1024:2048] == "lime").all()
    assert (out[2048:4096] == "cyan").all()
    assert (out[4096:] == "blue").all()
    # shorter threshold list: last tier color is colors[len(ths)]
    out2 = cm_ranking(np.sort(rng.rand(10))[::-1].copy(), ths=(2, 4))
    assert (out2[:2] == "red").all() and (out2[2:4] == "yellow").all()
    assert (out2[4:] == "lime").all()
