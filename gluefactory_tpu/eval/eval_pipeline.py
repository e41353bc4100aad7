"""Two-loop evaluation protocol (role of reference `eval/eval_pipeline.py:11-117`).

Loop 1 `get_predictions`: export model outputs -> predictions.h5.
Loop 2 `run_eval`: read the cache, compute metrics -> results.h5 +
summaries.json + figures. Conf-drift checks force --overwrite.
"""

from __future__ import annotations

import json
from pathlib import Path

import h5py
import numpy as np

from .. import logger
from ..core.config import Config, from_yaml, merge


def load_eval(dir_: Path):
    summaries, results = {}, {}
    with h5py.File(str(dir_ / "results.h5"), "r") as hfile:
        for k in hfile.keys():
            r = np.array(hfile[k])
            if len(r.shape) < 3:
                results[k] = r
        for k, v in hfile.attrs.items():
            summaries[k] = v
    with open(dir_ / "summaries.json", "r") as f:
        summaries = json.load(f)
    return summaries, results


def save_eval(dir_: Path, summaries: dict, figures: dict, results: dict):
    with h5py.File(str(dir_ / "results.h5"), "w") as hfile:
        for k, v in results.items():
            arr = np.array(v)
            if not np.issubdtype(arr.dtype, np.number):
                arr = arr.astype("object")
                dt = h5py.special_dtype(vlen=str)
                arr = np.array(v, dtype=object)
                hfile.create_dataset(k, data=arr, dtype=dt)
            else:
                hfile.create_dataset(k, data=arr)
    s = {
        k: float(v) if np.isscalar(v) and not isinstance(v, str) else v
        for k, v in summaries.items()
    }
    with open(dir_ / "summaries.json", "w") as f:
        json.dump(s, f, indent=4, default=str)
    for fig_name, fig in (figures or {}).items():
        fig.savefig(dir_ / f"{fig_name}.png")


def exists_eval(dir_: Path):
    return (dir_ / "results.h5").exists() and (dir_ / "summaries.json").exists()


class EvalPipeline:
    default_conf: dict = {}
    export_keys: list = []
    optional_export_keys: list = []

    def __init__(self, conf=None):
        self.default_conf = Config(self.default_conf)
        self.conf = merge(self.default_conf, conf or {})
        self._init(self.conf)

    def _init(self, conf):
        pass

    @classmethod
    def get_dataloader(cls, data_conf=None):
        raise NotImplementedError

    def get_predictions(self, experiment_dir, model=None, variables=None, overwrite=False):
        raise NotImplementedError

    def run_eval(self, loader, pred_file):
        raise NotImplementedError

    def save_conf(self, experiment_dir: Path, overwrite=False, overwrite_eval=False):
        conf_output_path = experiment_dir / "conf.yaml"
        if conf_output_path.exists():
            saved_conf = from_yaml(str(conf_output_path))
            if Config(self.conf.to_dict()).get("model") != saved_conf.get("model"):
                assert overwrite, (
                    "Config changed (model): rerun with --overwrite"
                )
            if self.conf.get("eval") != saved_conf.get("eval"):
                assert overwrite or overwrite_eval, (
                    "Config changed (eval): rerun with --overwrite_eval"
                )
        experiment_dir.mkdir(parents=True, exist_ok=True)
        with open(conf_output_path, "w") as f:
            f.write(Config(self.conf.to_dict()).to_yaml())

    def run(self, experiment_dir: Path, model=None, variables=None,
            overwrite=False, overwrite_eval=False):
        """Run the two loops (reference `eval_pipeline.py:81-100`)."""
        experiment_dir = Path(experiment_dir)
        experiment_dir.mkdir(parents=True, exist_ok=True)
        self.save_conf(experiment_dir, overwrite=overwrite, overwrite_eval=overwrite_eval)
        pred_file = self.get_predictions(
            experiment_dir, model=model, variables=variables, overwrite=overwrite
        )
        f = {}
        if not exists_eval(experiment_dir) or overwrite_eval or overwrite:
            s, f, r = self.run_eval(self.get_dataloader(self.conf.get("data")), pred_file)
            save_eval(experiment_dir, s, f, r)
        s, r = load_eval(experiment_dir)
        logger.info("Eval summaries: %s", {k: v for k, v in s.items()})
        return s, f, r
