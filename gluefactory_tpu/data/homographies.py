"""Synthetic homography-pair dataset for pretraining.

Role of reference `datasets/homographies.py:47-312`: per item, read an image,
sample two random homographies, warp two patches with cv2, apply photometric
augmentation per view, and return the exact patch-to-patch homography
`H_0to1`. Per-index RNG forking gives reproducible epochs.

Differences from the reference:
  - no auto-download (zero-egress environment): point `image_dir` at any
    folder of images (revisitop1m layout works);
  - `synthetic_images > 0` generates procedural images (seeded per index) so
    training/tests run hermetically without any dataset on disk.
"""

from __future__ import annotations

from pathlib import Path

import cv2
import numpy as np

from ..core.config import merge
from ..models.cache_loader import CacheLoader, pad_local_features
from ..settings import DATA_PATH
from .augmentations import IdentityAugmentation, augmentations
from .base_dataset import BaseDataset
from ..geometry.homography import sample_homography_corners


def _warp_points_np(points: np.ndarray, H: np.ndarray) -> np.ndarray:
    """Host-side forward homography warp of (N, 2) points (role of reference
    `geometry/homography.py:134-158` with inverse=False)."""
    pts = np.concatenate([points, np.ones_like(points[:, :1])], axis=1) @ H.T
    return pts[:, :2] / pts[:, 2:]


def generate_synthetic_image(seed: int, size=(640, 480)) -> np.ndarray:
    """Procedural textured image: random affine checkers + blobs + gradients."""
    from ..utils.hostlock import CV2_LOCK

    with CV2_LOCK:
        return _generate_synthetic_image_locked(seed, size)


def _generate_synthetic_image_locked(seed: int, size=(640, 480)) -> np.ndarray:
    rng = np.random.default_rng(seed)
    w, h = size
    img = np.zeros((h, w, 3), np.float32)
    # background gradient
    gx = np.linspace(0, 1, w, dtype=np.float32)[None, :, None]
    gy = np.linspace(0, 1, h, dtype=np.float32)[:, None, None]
    base = rng.uniform(0.1, 0.6, 3).astype(np.float32)
    img += base + 0.3 * gx * rng.uniform(-1, 1, 3) + 0.3 * gy * rng.uniform(-1, 1, 3)
    # random polygons / rectangles / circles
    for _ in range(40):
        color = rng.uniform(0, 1, 3).astype(float)
        kind = rng.integers(0, 3)
        if kind == 0:
            pt1 = (int(rng.integers(0, w)), int(rng.integers(0, h)))
            pt2 = (int(rng.integers(0, w)), int(rng.integers(0, h)))
            cv2.rectangle(img, pt1, pt2, color, -1)
        elif kind == 1:
            center = (int(rng.integers(0, w)), int(rng.integers(0, h)))
            cv2.circle(img, center, int(rng.integers(5, 60)), color, -1)
        else:
            pts = rng.integers(0, [w, h], size=(3, 2)).astype(np.int32)
            cv2.fillPoly(img, [pts], color)
    # light noise so descriptors aren't degenerate
    img += rng.normal(0, 0.02, img.shape).astype(np.float32)
    return np.clip(img, 0, 1)


def warp_patch(img: np.ndarray, H: np.ndarray, patch_shape) -> np.ndarray:
    from ..utils.hostlock import CV2_LOCK

    pw, ph = patch_shape
    with CV2_LOCK:
        out = cv2.warpPerspective(img, H, (int(pw), int(ph)), flags=cv2.INTER_LINEAR)
    if out.ndim == 2:
        out = out[..., None]
    return out


class _HomographyTorchDataset:
    def __init__(self, parent: "HomographyDataset", split: str):
        self.parent = parent
        self.conf = parent.conf
        self.split = split
        self.image_names = parent.images[split]

    def __len__(self):
        return len(self.image_names)

    def _read_image(self, idx: int) -> tuple:
        name = self.image_names[idx]
        if isinstance(name, int):  # synthetic
            return generate_synthetic_image(
                name, tuple(self.conf.source_size)
            ), np.array([1.0, 1.0], np.float32)
        from .preprocess import read_image

        try:
            img = read_image(name, grayscale=False)
        except IOError:
            # unreadable image -> zero fallback (reference homographies.py:238-240)
            img = np.zeros((self.conf.source_size[1], self.conf.source_size[0], 3), np.float32)
        # upscale tiny images to the working size; the factor is returned so
        # cached features (exported at native resolution) can be rescaled
        # into the upscaled frame the homographies are sampled on
        h, w = img.shape[:2]
        sw, sh = self.conf.source_size
        scale = np.array([1.0, 1.0], np.float32)
        if w < sw or h < sh:
            s = max(sw / w, sh / h)
            nw, nh = int(np.ceil(w * s)), int(np.ceil(h * s))
            img = cv2.resize(img, (nw, nh))
            # EFFECTIVE per-axis scale: the ceil'd target differs from w*s
            # by up to a pixel, so scaling keypoints by s alone would leave
            # a systematic sub-pixel offset near the far edge
            scale = np.array([nw / w, nh / h], np.float32)
        return img, scale

    def _transform_features(self, features: dict, H: np.ndarray, patch_shape) -> dict:
        """Warp cached keypoints into the sampled view, drop out-of-bounds
        ones, threshold/top-k, and optionally pad to a fixed length (role of
        reference `datasets/homographies.py:176-208` `_transform_keypoints`).

        Deliberate divergence: the reference's in-bounds step subsets ONLY
        `features["keypoints"]` (`homographies.py:190`), leaving scores and
        descriptors at their original length — a shape inconsistency that
        crashes any downstream indexing once points fall outside the crop.
        Here the in-bounds mask filters every per-keypoint array.
        """
        lf = self.conf.load_features
        kpts = _warp_points_np(
            np.asarray(features["keypoints"], np.float32), np.asarray(H, np.float32)
        )
        w, h = patch_shape
        valid = (
            (kpts[:, 0] >= 0)
            & (kpts[:, 0] <= w - 1)
            & (kpts[:, 1] >= 0)
            & (kpts[:, 1] <= h - 1)
        )
        features = dict(features, keypoints=kpts.astype(np.float32))
        features = {k: v[valid] for k, v in features.items()}
        if lf.thresh > 0:
            keep = features["keypoint_scores"] >= lf.thresh
            features = {k: v[keep] for k, v in features.items()}
        n = lf.max_num_keypoints
        if n > -1:
            inds = np.argsort(-features["keypoint_scores"])
            features = {k: v[inds[:n]] for k, v in features.items()}
            if lf.force_num_keypoints:
                features = pad_local_features(features, n)
        return features

    def _sample_view(
        self, img: np.ndarray, rng: np.random.Generator, aug, hconf, features=None
    ) -> dict:
        h, w = img.shape[:2]
        patch_shape = tuple(hconf.patch_shape)
        H, _, _, _ = sample_homography_corners(
            (w, h),
            patch_shape,
            difficulty=hconf.difficulty,
            translation=hconf.translation,
            n_angles=hconf.n_angles,
            max_angle=hconf.max_angle,
            min_convexity=hconf.min_convexity,
            rng=rng,
        )
        patch = warp_patch(img, H, patch_shape)
        patch = aug(patch, rng)
        if self.conf.grayscale:
            patch = cv2.cvtColor(patch, cv2.COLOR_RGB2GRAY)[..., None]
        view = {
            "image": patch.astype(np.float32),
            "image_size": np.array(patch_shape, dtype=np.float32),
            "H_": H.astype(np.float32),
            "coords": np.array(patch_shape, np.float32),
        }
        dl = self.conf.detect_lines
        if dl.do:
            from ..models.lines.wireframe import precompute_wireframe

            view.update(
                precompute_wireframe(
                    patch.astype(np.float32),
                    dl.max_num_lines, dl.min_length, dl.nms_radius,
                )
            )
        if features is not None:
            # cached-feature path (reference homographies.py:228-231): the
            # base image's exported features, warped into this view
            view["cache"] = self._transform_features(features, H, patch_shape)
        return view

    def __getitem__(self, idx: int) -> dict:
        conf = self.conf
        if conf.reseed:
            rng = np.random.default_rng((conf.seed, self.parent.epoch, idx))
        else:
            rng = np.random.default_rng()
        img, upscale = self._read_image(idx)
        if conf.emit_source:
            # on-device augmentation mode: ship the source image only;
            # warps + photometric jitter run inside the train step
            # (train.device_augment, data/device_homography.py)
            sw, sh = conf.source_size
            if img.shape[0] != sh or img.shape[1] != sw:
                img = cv2.resize(img, (sw, sh))
            return {
                "source_image": img.astype(np.float32),
                "idx": idx,
                "name": str(self.image_names[idx]),
            }
        name = self.image_names[idx]
        features = None
        if self.parent.feature_loader is not None:
            # load once per item; CacheLoader's `scales` hook rescales the
            # native-resolution export into the (possibly upscaled) frame
            # the homographies are sampled on
            features = self.parent.feature_loader(
                {"name": str(name), "scales": upscale}
            )
        n_views = 3 if conf.triplet else 2
        # right_only (reference homographies.py:62,168-170,245-249): view0 is
        # the original image rescaled to the patch (difficulty-0 homography),
        # with NO photometric augmentation; only view1(+2) get warped/jittered
        left_hconf = (
            self.parent.left_homography if conf.right_only else conf.homography
        )
        views = [
            self._sample_view(
                img,
                rng,
                self.parent.left_augment if i == 0 else self.parent.photo_augment,
                left_hconf if i == 0 else conf.homography,
                features=features,
            )
            for i in range(n_views)
        ]
        data = {"original_image_size": np.array(img.shape[:2][::-1], np.float32)}
        for i, v in enumerate(views):
            data[f"view{i}"] = {
                k: v[k] for k in v.keys() if k not in ("H_", "coords")
            }
        # exact patch-to-patch homography: H_0to1 = H1 @ H0^-1
        H0, H1 = views[0]["H_"], views[1]["H_"]
        data["H_0to1"] = (H1 @ np.linalg.inv(H0)).astype(np.float32)
        if conf.triplet:
            H2 = views[2]["H_"]
            data["H_0to2"] = (H2 @ np.linalg.inv(H0)).astype(np.float32)
            data["H_1to2"] = (H2 @ np.linalg.inv(H1)).astype(np.float32)
        data["idx"] = idx
        data["name"] = str(self.image_names[idx])
        return data


class HomographyDataset(BaseDataset):
    default_conf = {
        "data_dir": "revisitop1m",
        "image_dir": None,  # explicit folder of images
        "image_list": None,  # file of relative paths (reference: revisitop1m.txt) or explicit list
        "check_file_exists": False,  # verify every listed image exists on disk
        "glob": ["*.jpg", "*.png", "*.jpeg"],
        "synthetic_images": 0,  # >0: hermetic procedural image pool
        "source_size": [640, 480],
        "train_size": 100,
        "val_size": 10,
        "shuffle_seed": 0,
        "grayscale": False,
        "triplet": False,
        "right_only": False,  # image0 is orig (rescaled+unaugmented), image1 warped
        "reseed": True,
        "seed": 0,
        "emit_source": False,  # ship source images for on-device augmentation
        "homography": {
            "difficulty": 0.8,
            "translation": 1.0,
            "max_angle": 60,
            "n_angles": 10,
            "patch_shape": [640, 480],
            "min_convexity": 0.05,
        },
        # reference homographies.py:72-76: the dataset default is dark/0.75;
        # recipes that set only `name:` keep p=0.75 (the FULL merged sub-conf
        # is forwarded to the augmentation, overriding its class default)
        "photometric": {"name": "dark", "p": 0.75},
        # cached-feature training path (reference homographies.py:78-86):
        # load per-image exported features and warp them into each view
        "load_features": {
            "do": False,
            **CacheLoader.default_conf,
            "collate": False,
            "thresh": 0.0,
            "max_num_keypoints": -1,
            "force_num_keypoints": False,
        },
        # precompute LSD lines + wireframe junctions per view in the data
        # workers (for GlueStick training): the jitted train step then needs
        # no host callback. Must mirror the wireframe extractor's conf.
        "detect_lines": {
            "do": False,
            "max_num_lines": 250,
            "min_length": 15.0,
            "nms_radius": 3.0,
        },
    }

    def _init(self, conf):
        if conf.synthetic_images > 0:
            names = list(range(conf.synthetic_images))
        else:
            image_dir = Path(conf.image_dir) if conf.image_dir else DATA_PATH / conf.data_dir / "jpg"
            if conf.image_list is not None:
                # list-file / explicit-list discovery (reference
                # homographies.py:108-123): on the 1M-image corpus a
                # recursive glob per run is the wrong tool — the curated
                # list is the reproducible source of truth
                if isinstance(conf.image_list, (list, tuple)):
                    entries = [str(e) for e in conf.image_list]
                else:
                    list_path = Path(conf.image_list)
                    if not list_path.is_absolute():
                        # an explicit image_dir wins: the list sits next to
                        # the images; only the default corpus resolves the
                        # list under DATA_PATH/data_dir (reference
                        # homographies.py:108-116 root-relative layout)
                        list_path = (
                            image_dir / conf.image_list
                            if conf.image_dir
                            else DATA_PATH / conf.data_dir / conf.image_list
                        )
                    if not list_path.exists():
                        raise FileNotFoundError(f"cannot find image list {list_path}")
                    entries = list_path.read_text().rstrip("\n").split("\n")
                names = [image_dir / e for e in entries]
                if conf.check_file_exists:
                    for p in names:
                        if not p.exists():
                            raise FileNotFoundError(p)
            else:
                if not image_dir.exists():
                    raise FileNotFoundError(
                        f"image dir {image_dir} not found; set data.image_dir or use "
                        "data.synthetic_images for a procedural pool"
                    )
                names = []
                for pattern in conf.glob:
                    names += sorted(image_dir.rglob(pattern))
        rng = np.random.default_rng(conf.shuffle_seed)
        perm = rng.permutation(len(names))
        names = [names[i] for i in perm]
        train_size = min(conf.train_size, max(len(names) - conf.val_size, 1))
        val_size = min(conf.val_size, len(names))
        # val_size=0 means NO validation images — names[-0:] would be the
        # whole corpus (train/val leakage + full-dataset evals)
        val_names = names[-val_size:] if val_size > 0 else []
        self.images = {
            "train": names[:train_size],
            "val": val_names,
            "test": val_names,
        }
        # forward the FULL merged photometric sub-conf so the dataset-level
        # default p (0.75) overrides the augmentation's class default, and
        # user sub-keys are honored (reference homographies.py:162-167)
        aug_name = conf.photometric.name
        self.photo_augment = augmentations[aug_name](conf.photometric)
        self.left_augment = (
            IdentityAugmentation() if conf.right_only else self.photo_augment
        )
        self.left_homography = merge(conf.homography, {"difficulty": 0.0})
        if conf.load_features.do:
            self.feature_loader = CacheLoader(
                {
                    k: v
                    for k, v in conf.load_features.to_dict().items()
                    if k not in ("do", "thresh", "max_num_keypoints", "force_num_keypoints")
                }
            )
        else:
            self.feature_loader = None
        self.epoch = 0

    def get_dataset(self, split: str):
        return _HomographyTorchDataset(self, split)


if __name__ == "__main__":
    # dataset visualizer (reference datasets/homographies.py:282-312)
    import argparse

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from ..visualization.viz2d import plot_image_grid

    parser = argparse.ArgumentParser()
    parser.add_argument("--num_items", type=int, default=4)
    parser.add_argument("--synthetic", type=int, default=8)
    parser.add_argument("--out", type=str, default="homographies_samples.png")
    args = parser.parse_args()
    ds = HomographyDataset(
        {"synthetic_images": args.synthetic, "train_size": args.num_items, "val_size": 2}
    )
    tds = ds.get_dataset("train")
    rows = []
    for i in range(min(args.num_items, len(tds))):
        item = tds[i]
        rows.append([item["view0"]["image"], item["view1"]["image"]])
    plot_image_grid(rows)
    plt.savefig(args.out, dpi=120)
    print(f"wrote {args.out}")
