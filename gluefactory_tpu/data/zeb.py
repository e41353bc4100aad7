"""Zero-shot Evaluation Benchmark (ZEB) dataset (role of reference
`datasets/zeb.py:57-193`; format from github.com/xuelunshen/gim).

Layout: <root>/<scene>/<subscene>{-_}<img0>-<img1>.txt, one line:
`name0 name1 overlap0 overlap1 K0(9) K1(9) T(12|16)`; image files live next
to the pair files.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from ..settings import DATA_PATH
from .base_dataset import BaseDataset
from .geometry_io import scale_camera_dict
from .image_pairs import parse_camera, parse_relative_pose
from .preprocess import ImagePreprocessor, read_image


def read_pair_data(pairs_file: Path) -> list:
    with open(pairs_file, "r") as f:
        return f.readlines()[0].rstrip().split(" ")


def parse_overlap(pair_data: list):
    if len(pair_data) < 2:
        raise ValueError(f"pair data {pair_data} has no overlap info")
    return float(pair_data[0]), float(pair_data[1])


def parse_pairs(pairs_file: Path):
    pair_data = read_pair_data(pairs_file)
    file_name = pairs_file.stem
    img_name0, img_name1 = pair_data[:2]
    img_name0 = img_name0.split(".")[0]
    img_name1 = img_name1.split(".")[0]
    subscene_name = file_name.replace(f"{img_name0}-{img_name1}", "")
    subscene_name = subscene_name.replace(f"{img_name0}_{img_name1}", "")
    subscene_name, sep = subscene_name[:-1], subscene_name[-1]
    img_path0 = list(pairs_file.parent.glob(f"{subscene_name}{sep}{img_name0}.*"))[0]
    img_path1 = list(pairs_file.parent.glob(f"{subscene_name}{sep}{img_name1}.*"))[0]
    return img_path0, img_path1, pair_data[2:]


class _ZEBItems:
    def __init__(self, parent):
        self.parent = parent
        self.conf = parent.conf

    def __len__(self):
        return len(self.parent.items)

    def _read_view(self, path):
        data = self.parent.preprocessor(read_image(path))
        data["name"] = path.name
        return data

    def __getitem__(self, idx):
        pair_file = self.parent.items[idx]
        img_path0, img_path1, pair_data = parse_pairs(pair_file)
        data0 = self._read_view(img_path0)
        data1 = self._read_view(img_path1)
        data = {"view0": data0, "view1": data1}
        data["view0"]["camera"] = scale_camera_dict(
            parse_camera(pair_data[2:11]), data0["scales"]
        )
        data["view1"]["camera"] = scale_camera_dict(
            parse_camera(pair_data[11:20]), data1["scales"]
        )
        data["T_0to1"] = parse_relative_pose(pair_data[20:])
        data["scene"] = pair_file.parent.name
        data["name"] = data["scene"] + "/" + pair_file.stem
        data["overlap"] = min(*parse_overlap(pair_data[1:3]))
        data["idx"] = idx
        return data


class ZEBPairs(BaseDataset):
    default_conf = {
        "root": "zeb",
        "preprocessing": {},
        "scene_list": None,
        "exclude_scenes": None,
        "shuffle": False,
        "seed": 42,  # shuffle seed (reference zeb.py:64 overrides the base seed)
        "max_per_scene": None,
        "min_overlap": 0.0,
        "max_overlap": 1.0,
        "check": False,  # validate pair files at init (reference zeb.py:68,92-96)
    }

    def _init(self, conf):
        self.root = DATA_PATH / conf.root
        if not self.root.exists():
            raise FileNotFoundError(f"ZEB root {self.root} not found")
        if isinstance(conf.scene_list, (list, tuple)):
            self.scenes = list(conf.scene_list)
        elif isinstance(conf.scene_list, str):
            self.scenes = (self.root / conf.scene_list).read_text().rstrip("\n").split("\n")
        else:
            self.scenes = [s.name for s in self.root.glob("*") if s.is_dir()]
        if conf.exclude_scenes is not None:
            self.scenes = [s for s in self.scenes if s not in conf.exclude_scenes]
        self.items = []
        for i, scene in enumerate(sorted(self.scenes)):
            pair_files = list((self.root / scene).glob("*.txt"))
            if conf.check:
                for pair_file in pair_files[:900]:
                    parse_pairs(pair_file)  # asserts names/paths parse
            if conf.min_overlap > 0.0 or conf.max_overlap < 1.0:
                overlaps = np.array(
                    [min(*parse_overlap(read_pair_data(p)[2:4])) for p in pair_files]
                )
                valid = (overlaps >= conf.min_overlap) & (overlaps <= conf.max_overlap)
                pair_files = [pair_files[j] for j in np.where(valid)[0]]
            if conf.max_per_scene is not None and len(pair_files) > conf.max_per_scene:
                pair_files = sorted(pair_files, key=lambda x: x.stem)
                pair_files = list(
                    np.random.RandomState(i).choice(
                        pair_files, conf.max_per_scene, replace=False
                    )
                )
            self.items.extend(pair_files)
        if conf.shuffle:
            self.items = sorted(self.items, key=lambda x: x.stem)
            np.random.RandomState(conf.seed).shuffle(self.items)
        self.preprocessor = ImagePreprocessor(conf.preprocessing)

    def get_dataset(self, split):
        return _ZEBItems(self)


if __name__ == "__main__":
    # dataset visualizer (reference datasets/zeb.py:163-192); requires the
    # ZEB data under DATA_PATH (no auto-download)
    import argparse

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from ..core.config import from_dotlist, merge
    from ..visualization.viz2d import plot_image_grid

    parser = argparse.ArgumentParser()
    parser.add_argument("--num_items", type=int, default=12)
    parser.add_argument("--dpi", type=int, default=300)
    parser.add_argument("--out", type=str, default="zeb_pairs.png")
    parser.add_argument("dotlist", nargs="*")
    args = parser.parse_intermixed_args()
    conf = {
        "root": "zeb",
        "scene_list": None,
        "batch_size": 1,
        "num_workers": 0,
        "shuffle": False,
        "max_per_scene": 1,
    }
    conf = merge(conf, from_dotlist(args.dotlist))
    dataset = ZEBPairs(conf)
    ds = dataset.get_dataset("test")
    images = [
        [ds[i]["view0"]["image"], ds[i]["view1"]["image"]]
        for i in range(min(args.num_items, len(ds)))
    ]
    plot_image_grid(images, dpi=args.dpi)
    plt.savefig(args.out, dpi=args.dpi, bbox_inches="tight")
