"""ETH3D match-PR benchmark (role of reference `eval/eth3d.py:47-203`).

The GT depth matcher runs INSIDE the pipeline forward (`run_gt_in_forward`);
the export caches both predicted and GT matches; the eval loop aggregates
AP/PR curves for points (and lines when present).

Run: python -m gluefactory_tpu.eval.eth3d --conf superpoint+NN
"""

from __future__ import annotations

from collections import defaultdict
from pathlib import Path
from pprint import pprint

import h5py
import numpy as np

from ..data import get_dataset
from ..settings import EVAL_PATH
from ..utils.export_predictions import export_predictions
from .eval_pipeline import EvalPipeline
from .io import get_eval_parser, load_model, make_apply_fn, parse_eval_args
from .utils import aggregate_pr_results, get_tp_fp_pts


def eval_dataset(loader, pred_file, suffix=""):
    results = defaultdict(list)
    results["num_pos" + suffix] = 0
    with h5py.File(str(pred_file), "r") as hfile:
        for batch in loader:
            name = batch["name"][0]
            grp = hfile[name]
            pred = {k: np.asarray(grp[k]) for k in grp.keys()}
            if suffix == "":
                scores = pred["matching_scores0"]
                gt_matches = pred["gt_matches0"]
                pred_matches = pred["matches0"]
            else:
                scores = pred["line_matching_scores0"]
                gt_matches = pred["gt_line_matches0"]
                pred_matches = pred["line_matches0"]
            sort_indices = np.argsort(scores)[::-1]
            gt_matches = gt_matches[sort_indices]
            pred_matches = pred_matches[sort_indices]
            scores = scores[sort_indices]
            tp, fp, scores, num_pos = get_tp_fp_pts(pred_matches, gt_matches, scores)
            results["tp" + suffix].append(tp)
            results["fp" + suffix].append(fp)
            results["scores" + suffix].append(scores)
            results["num_pos" + suffix] += num_pos
    return aggregate_pr_results(results, suffix=suffix)


class ETH3DPipeline(EvalPipeline):
    default_conf = {
        "data": {
            "name": "eth3d",
            "batch_size": 1,
            "num_workers": 8,
        },
        "model": {
            "name": "two_view_pipeline",
            "run_gt_in_forward": True,
            "ground_truth": {
                "name": "depth_matcher",
                "use_points": True,
                "use_lines": False,
                "th_positive": 3.0,
                "th_negative": 5.0,
            },
        },
        "eval": {"plot_methods": [], "plot_line_methods": [], "eval_lines": False},
        "checkpoint": None,
        # group N items into one padded device dispatch during export
        # (relay-latency amortization; None = per-loader-batch)
        "items_per_dispatch": None,
    }
    export_keys = [
        "keypoints0", "keypoints1",
        "matches0", "matching_scores0",
        "gt_matches0",
    ]
    optional_export_keys = [
        "lines0", "lines1",
        "line_matches0", "line_matching_scores0",
        "gt_line_matches0",
    ]

    @classmethod
    def get_dataloader(cls, data_conf=None):
        data_conf = data_conf or cls.default_conf["data"]
        dataset = get_dataset("eth3d")(data_conf)
        return dataset.get_data_loader("test")

    def get_predictions(self, experiment_dir, model=None, variables=None, overwrite=False):
        pred_file = Path(experiment_dir) / "predictions.h5"
        if not pred_file.exists() or overwrite:
            if model is None:
                model, variables = load_model(self.conf.model, self.conf.get("checkpoint"))
            apply_fn = make_apply_fn(model, variables)
            export_predictions(
                self.get_dataloader(self.conf.get("data")),
                apply_fn,
                pred_file,
                keys=self.export_keys + self.optional_export_keys,
                trim_masks=True,
                items_per_dispatch=self.conf.get("items_per_dispatch"),
            )
        return pred_file

    def run_eval(self, loader, pred_file):
        results = eval_dataset(loader, pred_file)
        if self.conf.eval.eval_lines:
            results.update(eval_dataset(loader, pred_file, suffix="_lines"))
        summaries = {
            k: v for k, v in results.items() if not isinstance(v, np.ndarray)
        }
        figures = {}
        return summaries, figures, results


if __name__ == "__main__":
    dataset_name = Path(__file__).stem
    parser = get_eval_parser()
    args = parser.parse_intermixed_args()
    default_conf = ETH3DPipeline.default_conf
    output_dir = Path(EVAL_PATH, dataset_name)
    output_dir.mkdir(exist_ok=True, parents=True)
    name, conf = parse_eval_args(dataset_name, args, "configs/", default_conf)
    experiment_dir = output_dir / name
    experiment_dir.mkdir(exist_ok=True)
    pipeline = ETH3DPipeline(conf)
    s, f, r = pipeline.run(
        experiment_dir, overwrite=args.overwrite, overwrite_eval=args.overwrite_eval
    )
    pprint(s)
