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
