"""Cross-experiment scatter of per-item metrics (role of reference
`visualization/global_frame.py:17-290`): one point per eval item, axis
pickers over the available metrics, click-to-open the per-pair view."""

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
        self.fig, self.ax = plt.subplots()
        self.scatters = {}
        self.draw()
        self.fig.canvas.mpl_connect("pick_event", self.on_pick)

    def draw(self):
        self.ax.clear()
        for name, res in self.results.items():
            xs = np.asarray(res[self.x], float)
            ys = np.asarray(res[self.y], float)
            sc = self.ax.scatter(xs, ys, label=name, picker=5, alpha=0.6)
            self.scatters[sc] = name
        self.ax.set_xlabel(self.x)
        self.ax.set_ylabel(self.y)
        self.ax.legend()
        self.ax.grid(alpha=0.3)
        self.fig.canvas.draw_idle()

    def set_axes(self, x=None, y=None):
        if x:
            self.x = x
        if y:
            self.y = y
        self.draw()

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
