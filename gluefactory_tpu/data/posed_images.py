"""Generic posed-image benchmark dataset (role of reference
`datasets/posed_images.py:65-245`) — used by MegaDepth-1500.

Layout: <root>/<scene>/{<image_dir>/, <depth_dir>/, views.txt, pairs.txt}.
views.txt lines: `name R(9) t(3) MODEL width height params...`;
pairs.txt lines: `name0 name1 [...]` (view groups).
"""

from __future__ import annotations

import cv2
import h5py
import numpy as np

from ..settings import DATA_PATH
from .base_dataset import BaseDataset
from .geometry_io import (
    camera_dict_from_colmap,
    compose_pose,
    invert_pose,
    pose_matrix_from_Rt,
    scale_camera_dict,
)
from .preprocess import ImagePreprocessor, read_image


def names_to_pair(name0: str, name1: str, separator: str = "/") -> str:
    return separator.join((name0.replace("/", "-"), name1.replace("/", "-")))


def parse_pose_camera(fields: list):
    R = np.array(fields[:9], np.float32).reshape(3, 3)
    t = np.array(fields[9:12], np.float32)
    T_w2cam = pose_matrix_from_Rt(R, t)
    camera = camera_dict_from_colmap(
        fields[12], int(fields[13]), int(fields[14]), [float(x) for x in fields[15:]]
    )
    return T_w2cam, camera


def load_depth(depth_path, dformat: str) -> np.ndarray:
    if dformat == "png":
        depth_img = cv2.imread(str(depth_path), cv2.IMREAD_ANYDEPTH)
        return depth_img.astype(np.float32) / 256.0
    if dformat == "h5":
        with h5py.File(str(depth_path), "r") as f:
            return f["/depth"][...].astype(np.float32)
    raise ValueError(dformat)


class _PosedItems:
    def __init__(self, parent):
        self.parent = parent
        self.conf = parent.conf

    def __len__(self):
        return len(self.parent.items)

    def _read_view(self, scene, name) -> dict:
        parent = self.parent
        T_w2cam, camera = parse_pose_camera(parent.views[scene][name])
        img = read_image(parent.get_image_path(scene, name))
        data = parent.preprocessor(img)
        data["T_w2cam"] = T_w2cam
        data["camera"] = scale_camera_dict(camera, data["scales"])
        data["name"] = name
        if self.conf.depth_dir:
            depth = load_depth(
                parent.get_depth_path(scene, name), self.conf.depth_format
            )
            dproc = ImagePreprocessor(
                dict(parent.preprocessor.conf.to_dict(), interpolation="nearest", antialias=False)
            )(depth[..., None])
            data["depth"] = dproc["image"][..., 0]
            data["valid_depth"] = (data["depth"] > 0).astype(np.float32)
        if self.conf.extra_data:
            data.update(
                zip(self.conf.extra_keys, parent.extra_data[scene][name])
            )
        return data

    def __getitem__(self, idx):
        scene, *image_names = self.parent.items[idx]
        data = {}
        for i, image_name in enumerate(image_names):
            data[f"view{i}"] = self._read_view(scene, image_name)
        data["name"] = "/".join(n.replace("/", "-") for n in image_names)
        data["scene"] = scene
        data["idx"] = idx
        for i in range(1, len(image_names)):
            data[f"T_0to{i}"] = compose_pose(
                data[f"view{i}"]["T_w2cam"], invert_pose(data["view0"]["T_w2cam"])
            )
        return data


class PosedImageDataset(BaseDataset):
    default_conf = {
        "root": "???",
        "image_dir": "{scene}/images",
        "depth_dir": None,
        "views": "{scene}/views.txt",
        "view_groups": "{scene}/pairs.txt",
        "depth_format": "h5",
        "scene_list": None,
        # per-scene side-data text file (reference posed_images.py:71-72,
        # 120-131,166-169): lines `name v1 v2 ...` (literal-eval'd, `#`
        # comments skipped), merged into each view as dict(zip(extra_keys, vs))
        "extra_data": None,
        "extra_keys": [],
        "preprocessing": {},
    }

    def get_image_path(self, scene, img_name):
        return self.root / self.conf.image_dir.format(scene=scene) / img_name

    def get_depth_path(self, scene, img_name):
        depth_name = f"{img_name.split('.')[0]}.{self.conf.depth_format}"
        return self.root / self.conf.depth_dir.format(scene=scene) / depth_name

    def _init(self, conf):
        self.root = DATA_PATH / conf.root if conf.root != "" else DATA_PATH
        if not self.root.exists():
            raise FileNotFoundError(f"posed-images root {self.root} not found")
        if isinstance(conf.scene_list, (list, tuple)):
            self.scenes = list(conf.scene_list)
        elif isinstance(conf.scene_list, str):
            self.scenes = (self.root / conf.scene_list).read_text().rstrip("\n").split("\n")
        else:
            self.scenes = [s.name for s in self.root.glob("*") if s.is_dir()]
        self.views = {}
        self.extra_data = {}
        self.items = []
        for scene in self.scenes:
            views_path = self.root / conf.views.format(scene=scene)
            with open(views_path) as f:
                self.views[scene] = {
                    line.rstrip().split(" ")[0]: line.rstrip().split(" ")[1:]
                    for line in f
                }
            if conf.extra_data:
                import ast

                lines = (
                    (self.root / conf.extra_data.format(scene=scene))
                    .read_text()
                    .rstrip("\n")
                    .split("\n")
                )
                self.extra_data[scene] = {
                    line.split(" ")[0]: [
                        ast.literal_eval(x) for x in line.rstrip().split(" ")[1:]
                    ]
                    for line in lines
                    if not line.startswith("#")
                }
                for name in self.extra_data[scene]:
                    assert name in self.views[scene], (scene, name)
            if conf.view_groups:
                groups_path = self.root / conf.view_groups.format(scene=scene)
                groups = groups_path.read_text().rstrip("\n").split("\n")
                self.items += [[scene] + g.split(" ") for g in groups]
            else:
                self.items += [[scene, name] for name in self.views[scene]]
        self.preprocessor = ImagePreprocessor(conf.preprocessing)

    def get_dataset(self, split):
        return _PosedItems(self)


if __name__ == "__main__":
    # dataset visualizer (reference datasets/posed_images.py:203-243);
    # requires the posed-images data under DATA_PATH (no auto-download)
    import argparse

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from ..core.config import from_dotlist, merge
    from ..visualization.viz2d import plot_heatmaps, plot_image_grid

    parser = argparse.ArgumentParser()
    parser.add_argument("--num_items", type=int, default=4)
    parser.add_argument("--dpi", type=int, default=100)
    parser.add_argument("--out", type=str, default="posed_images_samples.png")
    parser.add_argument("dotlist", nargs="*")
    args = parser.parse_intermixed_args()
    conf = {
        "root": "megadepth1500",
        "depth_dir": "{scene}/depths",
        "preprocessing": {
            "resize": 1600,
            "side": "long",
            "interpolation": "area",
            "antialias": False,
        },
        "num_workers": 0,
        "batch_size": 1,
    }
    conf = merge(conf, from_dotlist(args.dotlist))
    dataset = PosedImageDataset(conf)
    ds = dataset.get_dataset("test")
    images, depths = [], []
    for i in range(min(args.num_items, len(ds))):
        data = ds[i]
        views = [data[k] for k in sorted(data) if k.startswith("view")]
        images.append([v["image"] for v in views])
        depths.append([v.get("depth") for v in views])
    axes = plot_image_grid(images, dpi=args.dpi)
    for i in range(len(images)):
        if all(d is not None for d in depths[i]):
            plot_heatmaps(depths[i], axes=axes[i])
    plt.savefig(args.out, dpi=args.dpi)
