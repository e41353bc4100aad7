"""Cross-experiment scatter of per-item metrics (role of reference
`visualization/global_frame.py:17-290`): one point per eval item, axis
pickers over the available metrics, hover tooltips, experiment diff mode,
click-to-open the per-pair view.

Interactivity (matching the reference's affordances):
  hover        tooltip with item name + (x, y) values
  click        open the TwoViewFrame for that pair
  x / X, y / Y cycle the x / y metric forward / backward
  d            toggle diff mode (>= 2 experiments: y becomes exp_i - exp_0)
Legend entries carry per-experiment medians (the reference's summary bars).
"""

from __future__ import annotations

import matplotlib.pyplot as plt
import numpy as np


class GlobalFrame:
    default_conf = {"x": None, "y": None, "diff": False}

    child_frames = []

    def __init__(self, conf, results: dict, loader, predictions, child_frame=None):
        """results: {experiment_name: {metric: per-item array, 'names': [...]}}."""
        self.conf = {**self.default_conf, **(conf or {})}
        self.results = results
        self.loader = loader
        self.predictions = predictions
        self.child_frame = child_frame
        self.names = list(next(iter(results.values()))["names"])
        metrics = [
            k
            for k, v in next(iter(results.values())).items()
            if isinstance(v, (list, np.ndarray))
            and len(v) == len(self.names)
            and np.issubdtype(np.asarray(v).dtype, np.number)
        ]
        self.metrics = metrics
        self.x = self.conf["x"] or metrics[0]
        self.y = self.conf["y"] or (metrics[1] if len(metrics) > 1 else metrics[0])
        self.diff = bool(self.conf["diff"]) and len(results) > 1
        self.fig, self.ax = plt.subplots()
        self.scatters = {}
        self.annot = None
        self.draw()
        self.fig.canvas.mpl_connect("pick_event", self.on_pick)
        self.fig.canvas.mpl_connect("key_press_event", self.on_key)
        self.fig.canvas.mpl_connect("motion_notify_event", self.on_hover)

    def _series(self, name):
        """(xs, ys) for one experiment under the current mode."""
        res = self.results[name]
        xs = np.asarray(res[self.x], float)
        ys = np.asarray(res[self.y], float)
        if self.diff:
            base = next(iter(self.results.values()))
            ys = ys - np.asarray(base[self.y], float)
        return xs, ys

    def draw(self):
        self.ax.clear()
        self.scatters = {}
        for name, res in self.results.items():
            xs, ys = self._series(name)
            med_x, med_y = np.nanmedian(xs), np.nanmedian(ys)
            label = f"{name} (med {med_x:.3g}, {med_y:.3g})"
            sc = self.ax.scatter(xs, ys, label=label, picker=5, alpha=0.6)
            self.scatters[sc] = name
        self.ax.set_xlabel(self.x)
        ylabel = self.y if not self.diff else f"Δ{self.y} vs {next(iter(self.results))}"
        self.ax.set_ylabel(ylabel)
        if self.diff:
            self.ax.axhline(0.0, color="k", lw=0.8, alpha=0.5)
        self.ax.legend(fontsize="small")
        self.ax.grid(alpha=0.3)
        self.ax.set_title(
            "hover: info | click: open pair | x/X y/Y: cycle metrics | d: diff",
            fontsize="small",
        )
        self.annot = self.ax.annotate(
            "", xy=(0, 0), xytext=(12, 12), textcoords="offset points",
            bbox=dict(boxstyle="round", fc="w", alpha=0.9),
            arrowprops=dict(arrowstyle="->"),
        )
        self.annot.set_visible(False)
        self.fig.canvas.draw_idle()

    def set_axes(self, x=None, y=None):
        if x:
            self.x = x
        if y:
            self.y = y
        self.draw()

    # ---------------------------------------------------------------- events
    def on_key(self, event):
        if event.key in ("x", "X", "y", "Y"):
            step = 1 if event.key.islower() else -1
            axis = event.key.lower()
            cur = self.x if axis == "x" else self.y
            nxt = self.metrics[(self.metrics.index(cur) + step) % len(self.metrics)]
            self.set_axes(**{axis: nxt})
        elif event.key == "d" and len(self.results) > 1:
            self.diff = not self.diff
            self.draw()

    def on_hover(self, event):
        if event.inaxes != self.ax or self.annot is None:
            return
        for sc, name in self.scatters.items():
            hit, info = sc.contains(event)
            if hit:
                idx = int(info["ind"][0])
                xs, ys = self._series(name)
                self.annot.xy = (xs[idx], ys[idx])
                self.annot.set_text(
                    f"{self.names[idx]}\n{name}\n"
                    f"{self.x}={xs[idx]:.4g}\n{self.y}={ys[idx]:.4g}"
                )
                self.annot.set_visible(True)
                self.fig.canvas.draw_idle()
                return
        if self.annot.get_visible():
            self.annot.set_visible(False)
            self.fig.canvas.draw_idle()

    def on_pick(self, event):
        idx = int(event.ind[0])
        name = self.names[idx]
        if self.child_frame is None:
            print(f"picked item {idx}: {name}")
            return
        data = None
        for i, batch in enumerate(self.loader):
            if i == idx:
                from ..utils.tensor import map_tensor

                data = map_tensor(batch, lambda t: np.asarray(t)[0])
                break
        preds = {
            exp: self.predictions[exp](name) for exp in self.predictions
        }
        frame = self.child_frame({}, data, preds, title=str(name))
        self.child_frames.append(frame)
        plt.show()
