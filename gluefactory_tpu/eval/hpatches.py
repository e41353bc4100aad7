"""HPatches homography-estimation benchmark (role of reference
`eval/hpatches.py:29-203`).

Loop 1 exports matches at original resolution; loop 2 rescales them into
processed coordinates (the reference CacheLoader behavior), computes DLT and
RANSAC homography errors, match precision, and AUC@{1,3,5}px summaries with
best-threshold selection by mAA.

Run: python -m gluefactory_tpu.eval.hpatches --conf superpoint+lightglue-official
"""

from __future__ import annotations

from collections import defaultdict
from collections.abc import Iterable
from pathlib import Path
from pprint import pprint

import h5py
import numpy as np

from ..data import get_dataset
from ..settings import EVAL_PATH
from ..utils.export_predictions import export_predictions
from ..utils.tensor import map_tensor
from ..utils.tools import AUCMetric
from .eval_pipeline import EvalPipeline
from .io import get_eval_parser, load_model, make_apply_fn, parse_eval_args
from .utils import (
    eval_homography_dlt,
    eval_homography_robust,
    eval_matches_homography,
)
from .utils import eval_poses


def load_cached_prediction(hfile: h5py.File, name: str, data_i: dict) -> dict:
    """Read a cached prediction and rescale keypoints/lines into processed
    coordinates (role of reference CacheLoader, `models/cache_loader.py:59-144`)."""
    grp = hfile[name]
    pred = {k: np.asarray(grp[k]) for k in grp.keys()}
    for i in ("0", "1"):
        scales = data_i.get(f"view{i}", {}).get("scales")
        if scales is None:
            continue
        for key in (f"keypoints{i}", f"lines{i}", f"orig_lines{i}"):
            if key in pred:
                pred[key] = pred[key] * np.asarray(scales).reshape(
                    *([1] * (pred[key].ndim - 1)), 2
                )
    return pred


class HPatchesPipeline(EvalPipeline):
    default_conf = {
        "data": {
            "batch_size": 1,
            "name": "hpatches",
            "num_workers": 8,
            "preprocessing": {"resize": 480, "side": "short"},
        },
        "model": {"ground_truth": {"name": None}},
        "eval": {
            "estimator": "opencv",  # opencv | xla_ransac
            "ransac_th": 0.5,  # <=0 sweeps thresholds, best by mAA
        },
        "checkpoint": None,
        # group N items into one padded device dispatch during export
        # (relay-latency amortization; None = per-loader-batch)
        "items_per_dispatch": None,
    }
    export_keys = [
        "keypoints0", "keypoints1",
        "keypoint_scores0", "keypoint_scores1",
        "matches0", "matches1",
        "matching_scores0", "matching_scores1",
    ]
    optional_export_keys = [
        "lines0", "lines1", "orig_lines0", "orig_lines1",
        "line_matches0", "line_matches1",
        "line_matching_scores0", "line_matching_scores1",
    ]

    @classmethod
    def get_dataloader(cls, data_conf=None):
        data_conf = data_conf or cls.default_conf["data"]
        dataset = get_dataset("hpatches")(data_conf)
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
                items_per_dispatch=self.conf.get("items_per_dispatch"),
            )
        return pred_file

    def run_eval(self, loader, pred_file):
        assert Path(pred_file).exists()
        results = defaultdict(list)
        conf = self.conf.eval
        test_thresholds = (
            ([conf.ransac_th] if conf.ransac_th > 0 else [0.5, 1.0, 1.5, 2.0, 2.5, 3.0])
            if not isinstance(conf.ransac_th, Iterable)
            else list(conf.ransac_th)
        )
        pose_results = defaultdict(lambda: defaultdict(list))
        with h5py.File(str(pred_file), "r") as hfile:
            for i, batch in enumerate(loader):
                data_i = map_tensor(batch, lambda t: np.asarray(t)[0])
                name = batch["name"][0]
                pred = load_cached_prediction(hfile, name, data_i)
                if "keypoints0" in pred:
                    results_i = eval_matches_homography(data_i, pred)
                    results_i = {**results_i, **eval_homography_dlt(data_i, pred)}
                else:
                    results_i = {}
                for th in test_thresholds:
                    pose_results_i = eval_homography_robust(
                        data_i, pred, {"estimator": conf.estimator, "ransac_th": th}
                    )
                    for k, v in pose_results_i.items():
                        pose_results[th][k].append(v)
                results_i["names"] = name
                results_i["scenes"] = data_i["scene"] if isinstance(data_i.get("scene"), str) else batch["scene"][0]
                for k, v in results_i.items():
                    results[k].append(v)

        summaries = {}
        for k, v in results.items():
            arr = np.array(v)
            if not np.issubdtype(arr.dtype, np.number):
                continue
            summaries[f"m{k}"] = round(float(np.median(arr)), 3)

        auc_ths = [1, 3, 5]
        best_pose_results, best_th = eval_poses(
            pose_results, auc_ths=auc_ths, key="H_error_ransac", unit="px"
        )
        if "H_error_dlt" in results.keys():
            dlt_aucs = AUCMetric(auc_ths, results["H_error_dlt"]).compute()
            for j, ath in enumerate(auc_ths):
                summaries[f"H_error_dlt@{ath}px"] = dlt_aucs[j]

        results = {**results, **pose_results[best_th]}
        summaries = {**summaries, **best_pose_results}

        figures = {}
        try:
            from ..visualization.viz2d import plot_cumulative

            figures["homography_recall"] = plot_cumulative(
                {
                    "DLT": results["H_error_dlt"],
                    self.conf.eval.estimator: results["H_error_ransac"],
                },
                [0, 10],
                unit="px",
                title="Homography ",
            )
        except Exception:
            pass
        return summaries, figures, results


if __name__ == "__main__":
    import matplotlib.pyplot as plt

    dataset_name = Path(__file__).stem
    parser = get_eval_parser()
    args = parser.parse_intermixed_args()
    default_conf = HPatchesPipeline.default_conf
    output_dir = Path(EVAL_PATH, dataset_name)
    output_dir.mkdir(exist_ok=True, parents=True)
    name, conf = parse_eval_args(dataset_name, args, "configs/", default_conf)
    experiment_dir = output_dir / name
    experiment_dir.mkdir(exist_ok=True)
    pipeline = HPatchesPipeline(conf)
    s, f, r = pipeline.run(
        experiment_dir, overwrite=args.overwrite, overwrite_eval=args.overwrite_eval
    )
    pprint(s)
    if args.plot:
        plt.show()
