"""ETH3D multiview dataset for match PR evaluation (role of reference
`datasets/eth3d.py:63-255`).

COLMAP-text calibration parsing, covisible-point counting to form pairs,
downsized undistorted png depth. No auto-download (zero-egress): place the
SOLD2 `ETH3D_undistorted` export under DATA_PATH.
"""

from __future__ import annotations

import os
import cv2
import numpy as np

from ..settings import DATA_PATH
from .base_dataset import BaseDataset
from .geometry_io import camera_dict_from_colmap, compose_pose, invert_pose
from .preprocess import ImagePreprocessor, read_image


def qvec2rotmat(qvec) -> np.ndarray:
    w, x, y, z = qvec
    return np.array(
        [
            [1 - 2 * y**2 - 2 * z**2, 2 * x * y - 2 * z * w, 2 * x * z + 2 * y * w],
            [2 * x * y + 2 * z * w, 1 - 2 * x**2 - 2 * z**2, 2 * y * z - 2 * x * w],
            [2 * x * z - 2 * y * w, 2 * y * z + 2 * x * w, 1 - 2 * x**2 - 2 * y**2],
        ],
        dtype=np.float32,
    )


def read_cameras(camera_file: str, scale_factor: float | None = None) -> list:
    """Parse a COLMAP cameras.txt into camera dicts, optionally rescaled."""
    with open(camera_file) as f:
        raw = f.read().rstrip().split("\n")
    raw = [line for line in raw if not line.startswith("#")]
    cameras = {}
    for line in raw:
        fields = line.split(" ")
        cam_id = int(fields[0])
        model = fields[1]
        width, height = int(fields[2]), int(fields[3])
        params = [float(x) for x in fields[4:]]
        cam = camera_dict_from_colmap(model, width, height, params)
        if scale_factor is not None:
            from .geometry_io import scale_camera_dict

            cam = scale_camera_dict(cam, [scale_factor, scale_factor])
        cameras[cam_id] = cam
    return cameras


class _ETH3DItems:
    def __init__(self, parent):
        self.parent = parent
        self.conf = parent.conf

    def __len__(self):
        return len(self.parent.data)

    def _read_image(self, img_path):
        img = read_image(img_path, grayscale=self.conf.grayscale)
        h, w = img.shape[:2]
        return self.parent.preprocessor_for(max(h, w) // self.conf.downsize_factor)(img)

    def _read_depth(self, depth_path):
        depth_img = cv2.imread(str(depth_path), cv2.IMREAD_ANYDEPTH)
        return depth_img.astype(np.float32) / 256.0

    def __getitem__(self, idx):
        data = dict(self.parent.data[idx])
        view0 = dict(data.pop("view0"))
        view1 = dict(data.pop("view1"))
        view0.update(self._read_image(view0.pop("img_path")))
        view1.update(self._read_image(view1.pop("img_path")))
        view0["scales"] = np.array([1.0, 1.0], np.float32)
        view1["scales"] = np.array([1.0, 1.0], np.float32)
        view0["depth"] = self._read_depth(view0.pop("depth_path"))
        view1["depth"] = self._read_depth(view1.pop("depth_path"))
        return {
            **data,
            "view0": view0,
            "view1": view1,
            "name": f"{view0['name']}_{view1['name']}",
            "idx": idx,
        }


class ETH3DDataset(BaseDataset):
    default_conf = {
        "data_dir": "ETH3D_undistorted",
        "grayscale": True,
        "downsize_factor": 8,
        "min_covisibility": 500,
        "batch_size": 1,
        "two_view": True,
        "seed": 0,
    }

    def preprocessor_for(self, resize):
        return ImagePreprocessor({"resize": int(resize)})

    def _init(self, conf):
        self.img_dir = DATA_PATH / conf.data_dir
        if not self.img_dir.exists():
            raise FileNotFoundError(f"ETH3D not found at {self.img_dir}")
        self.data = []
        for folder in sorted(self.img_dir.iterdir()):
            if not folder.is_dir():
                continue
            img_folder = folder / "images" / "dslr_images_undistorted"
            depth_folder = folder / "ground_truth_depth" / "undistorted_depth"
            names = sorted(img.name for img in img_folder.iterdir())

            cameras = read_cameras(
                str(folder / "dslr_calibration_undistorted" / "cameras.txt"),
                1.0 / conf.downsize_factor,
            )
            name_to_cam_idx = {name: {} for name in names}
            with open(folder / "dslr_calibration_jpg" / "images.txt") as f:
                raw_data = f.read().rstrip().split("\n")[4::2]
            for raw_line in raw_data:
                line = raw_line.split(" ")
                img_name = os.path.basename(line[-1])
                if img_name in name_to_cam_idx:
                    name_to_cam_idx[img_name]["dist_camera_idx"] = int(line[-2])
            T_w2c = {}
            visible_pts = {}
            with open(folder / "dslr_calibration_undistorted" / "images.txt") as f:
                lines = f.readlines()[4:]
            raw_poses = [line.strip("\n").split(" ") for line in lines[::2]]
            raw_points = [line.strip("\n").split(" ") for line in lines[1::2]]
            for raw_pose, raw_pts in zip(raw_poses, raw_points):
                img_name = os.path.basename(raw_pose[-1])
                ext = list(map(float, raw_pose[1:8]))
                pose = np.eye(4, dtype=np.float32)
                pose[:3, :3] = qvec2rotmat(ext[:4])
                pose[:3, 3] = ext[4:]
                T_w2c[img_name] = pose
                visible_pts[img_name] = {
                    int(i) for i in raw_pts[2::3] if int(i) != -1
                }

            n = len(names)
            covis = np.zeros((n, n))
            for i in range(n - 1):
                for j in range(i + 1, n):
                    covis[i, j] = len(visible_pts[names[i]] & visible_pts[names[j]])
            valid_pairs = np.stack(np.where(covis >= conf.min_covisibility), axis=1)
            for i, j in valid_pairs:
                self.data.append(
                    {
                        "view0": {
                            "name": names[i][:-4],
                            "img_path": str(img_folder / names[i]),
                            "depth_path": str(depth_folder / names[i][:-4]) + ".png",
                            "camera": cameras[
                                name_to_cam_idx[names[i]]["dist_camera_idx"]
                            ],
                            "T_w2cam": T_w2c[names[i]],
                        },
                        "view1": {
                            "name": names[j][:-4],
                            "img_path": str(img_folder / names[j]),
                            "depth_path": str(depth_folder / names[j][:-4]) + ".png",
                            "camera": cameras[
                                name_to_cam_idx[names[j]]["dist_camera_idx"]
                            ],
                            "T_w2cam": T_w2c[names[j]],
                        },
                        "T_0to1": compose_pose(
                            T_w2c[names[j]], invert_pose(T_w2c[names[i]])
                        ),
                        "n_covisible_points": float(covis[i, j]),
                    }
                )

    def get_dataset(self, split):
        return _ETH3DItems(self)
