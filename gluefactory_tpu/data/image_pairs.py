"""Text-file image-pairs dataset (role of reference
`datasets/image_pairs.py:47-106`) — used by ScanNet-1500 and ZEB.

Pair-file line formats:
  `name0 name1`                                   (no extra data)
  `name0 name1 K0(9) K1(9) T(12|16)`              (extra_data: relative_pose)
  `name0 name1 H(9)`                              (extra_data: homography)
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from ..settings import DATA_PATH
from .base_dataset import BaseDataset
from .geometry_io import camera_dict_from_K, scale_camera_dict
from .posed_images import names_to_pair
from .preprocess import ImagePreprocessor, read_image


def parse_camera(elems) -> dict:
    K = np.array([float(x) for x in elems[:9]]).reshape(3, 3)
    return camera_dict_from_K(K)


def parse_relative_pose(elems) -> np.ndarray:
    vals = [float(x) for x in elems]
    if len(vals) == 12:
        T = np.eye(4, dtype=np.float32)
        T[:3] = np.array(vals).reshape(3, 4)
        return T
    if len(vals) == 16:
        return np.array(vals, np.float32).reshape(4, 4)
    raise ValueError(f"cannot interpret pose of {len(vals)} values")


class _PairItems:
    def __init__(self, parent):
        self.parent = parent
        self.conf = parent.conf

    def __len__(self):
        return len(self.parent.items)

    def _read_view(self, name):
        path = DATA_PATH / self.conf.root / name
        return self.parent.preprocessor(read_image(path))

    def __getitem__(self, idx):
        line = self.parent.items[idx]
        pair_data = line.split(" ")
        name0, name1 = pair_data[:2]
        data0 = self._read_view(name0)
        data1 = self._read_view(name1)
        data = {"view0": data0, "view1": data1}
        if self.conf.extra_data == "relative_pose":
            data["view0"]["camera"] = scale_camera_dict(
                parse_camera(pair_data[2:11]), data0["scales"]
            )
            data["view1"]["camera"] = scale_camera_dict(
                parse_camera(pair_data[11:20]), data1["scales"]
            )
            data["T_0to1"] = parse_relative_pose(pair_data[20:])
        elif self.conf.extra_data == "homography":
            H = np.array([float(x) for x in pair_data[2:11]]).reshape(3, 3)
            data["H_0to1"] = (
                data1["transform"] @ H @ np.linalg.inv(data0["transform"])
            ).astype(np.float32)
        else:
            assert self.conf.extra_data is None, self.conf.extra_data
        data["name"] = names_to_pair(name0, name1)
        data["idx"] = idx
        return data


class ImagePairs(BaseDataset):
    default_conf = {
        "pairs": "???",
        "root": "???",
        "preprocessing": {},
        "extra_data": None,  # relative_pose | homography | None
    }

    def _init(self, conf):
        pair_f = Path(conf.pairs) if Path(conf.pairs).exists() else DATA_PATH / conf.pairs
        if not pair_f.exists():
            raise FileNotFoundError(f"pairs file {pair_f} not found")
        with open(pair_f) as f:
            self.items = [line.rstrip() for line in f if line.strip()]
        self.preprocessor = ImagePreprocessor(conf.preprocessing)

    def get_dataset(self, split):
        return _PairItems(self)
