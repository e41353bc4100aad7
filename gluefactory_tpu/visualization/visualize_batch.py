"""Train-time figure hook (role of reference
`visualization/visualize_batch.py:7-57`): GT-correctness-colored match plots
for the first few batch items, referenced by `train.plot` conf entries."""

from __future__ import annotations

import numpy as np

from ..utils.tensor import to_numpy
from .viz2d import cm_RdGn, plot_images, plot_keypoints, plot_matches


def make_match_figures(pred_, data_, n_pairs: int = 2) -> dict:
    import matplotlib.pyplot as plt

    pred = to_numpy(pred_)
    data = to_numpy(data_)
    images, kpts, matches, mcolors = [], [], [], []
    heatmaps = []
    view0, view1 = data["view0"], data["view1"]
    n_pairs = min(n_pairs, view0["image"].shape[0])
    ok = np.isin(list(pred.keys()), ["matches0", "keypoints0"]).sum() >= 0

    for i in range(n_pairs):
        valid = pred["matches0"][i] > -1
        kpm0 = pred["keypoints0"][i][valid]
        kpm1 = pred["keypoints1"][i][pred["matches0"][i][valid]]
        images.append([view0["image"][i], view1["image"][i]])
        kpts.append([pred["keypoints0"][i], pred["keypoints1"][i]])
        matches.append((kpm0, kpm1))
        if "gt_matches0" in pred:
            correct = pred["gt_matches0"][i][valid] == pred["matches0"][i][valid]
            mcolors.append(cm_RdGn(correct).tolist())
        else:
            mcolors.append("lime")

    figs = {}
    for i in range(n_pairs):
        fig = plt.figure()
        plot_images(images[i])
        plot_keypoints(kpts[i], colors="royalblue")
        plot_matches(*matches[i], color=mcolors[i], a=0.5, lw=1.0, ps=0)
        figs[f"match_{i}"] = plt.gcf()
    return figs
