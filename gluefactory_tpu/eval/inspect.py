"""Interactive results inspector (role of reference `eval/inspect.py:15-61`):
scatter per-item metrics of one or more eval experiments; click a point to
open the two-view frame for that pair.

Run: python -m gluefactory_tpu.eval.inspect <benchmark> <experiment> [more...]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import h5py
import matplotlib.pyplot as plt
import numpy as np

from ..settings import EVAL_PATH
from . import get_benchmark
from .eval_pipeline import load_eval
from ..visualization.global_frame import GlobalFrame
from ..visualization.two_view_frame import TwoViewFrame


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("benchmark", type=str)
    parser.add_argument("experiments", type=str, nargs="+")
    parser.add_argument("--x", type=str, default=None)
    parser.add_argument("--y", type=str, default=None)
    parser.add_argument(
        "--diff", action="store_true",
        help="plot y as the per-item difference vs the first experiment",
    )
    args = parser.parse_args()

    output_dir = Path(EVAL_PATH, args.benchmark)
    results = {}
    predictions = {}
    for exp in args.experiments:
        exp_dir = output_dir / exp
        _, res = load_eval(exp_dir)
        results[exp] = res
        pred_file = exp_dir / "predictions.h5"

        def make_loader(pf):
            hfile = h5py.File(str(pf), "r")

            def load(name):
                grp = hfile[str(name)]
                return {k: np.asarray(grp[k]) for k in grp.keys()}

            return load

        predictions[exp] = make_loader(pred_file)

    pipeline_cls = get_benchmark(args.benchmark)
    loader = pipeline_cls.get_dataloader()
    GlobalFrame(
        {"x": args.x, "y": args.y, "diff": args.diff}, results, loader, predictions,
        child_frame=TwoViewFrame,
    )
    plt.show()


if __name__ == "__main__":
    main()
