"""Per-pair interactive view (role of reference
`visualization/two_view_frame.py:21-177`): shows the image pair with the
selected plot mode; keys cycle through modes."""

from __future__ import annotations

import matplotlib.pyplot as plt
import numpy as np

from . import tools
from .viz2d import plot_images


class TwoViewFrame:
    default_conf = {"default": "matches", "summary_visible": False}

    plot_dict = tools.__plot_dict__
    childs = []

    def __init__(self, conf, data, preds, title=None, event=None):
        self.conf = conf
        self.data = data
        self.preds = preds
        imgs = [
            np.asarray(data["view0"]["image"]),
            np.asarray(data["view1"]["image"]),
        ]
        self.fig = plt.figure()
        self.axes = plot_images(imgs, titles=None)
        if title:
            self.fig.suptitle(title)
        # use the first prediction set for plotting
        pred = next(iter(preds.values())) if isinstance(preds, dict) else preds
        self.radio = tools.RadioHideTool(
            self.fig, self.axes, data, pred, self.plot_dict, default=conf.get("default", "matches")
        )
        self.fig.canvas.mpl_connect("key_press_event", self.on_key)

    def on_key(self, event):
        names = list(self.plot_dict)
        if event.key in ("right", "left"):
            idx = names.index(self.radio.current)
            idx = (idx + (1 if event.key == "right" else -1)) % len(names)
            self.radio.draw(names[idx])
