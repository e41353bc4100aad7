"""Image loading and preprocessing (role of reference `utils/image.py:15-133`).

Host-side numpy/cv2: resize by short/long/vert/horz side, `edge_divisible_by`,
optional square padding with a validity mask. Images are float32 NHWC in
[0, 1] (TPU-native layout; the reference uses CHW torch tensors).
"""

from __future__ import annotations

from pathlib import Path

import cv2
import numpy as np

from ..core.config import Config, merge


def read_image(path: str | Path, grayscale: bool = False) -> np.ndarray:
    """Read an image as float32 HWC RGB (or HW1 gray) in [0, 1]."""
    from ..utils.hostlock import CV2_LOCK

    mode = cv2.IMREAD_GRAYSCALE if grayscale else cv2.IMREAD_COLOR
    with CV2_LOCK:
        img = cv2.imread(str(path), mode)
        if img is None:
            raise IOError(f"could not read image {path}")
        if grayscale:
            img = img[..., None]
        else:
            img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    return img.astype(np.float32) / 255.0


def resize_image(img: np.ndarray, size, interp: str = "linear"):
    """Resize to (w, h); returns (resized, scales (2,) new/old [x, y])."""
    h, w = img.shape[:2]
    nw, nh = size
    flag = {
        "linear": cv2.INTER_LINEAR,
        "cubic": cv2.INTER_CUBIC,
        "nearest": cv2.INTER_NEAREST,
        "area": cv2.INTER_AREA,
    }[interp]
    from ..utils.hostlock import CV2_LOCK

    with CV2_LOCK:
        resized = cv2.resize(img, (int(nw), int(nh)), interpolation=flag)
    if resized.ndim == 2:
        resized = resized[..., None]
    scales = np.array([nw / w, nh / h], dtype=np.float32)
    return resized, scales


class ImagePreprocessor:
    default_conf = {
        "resize": None,  # target size (int)
        "edge_divisible_by": None,
        "side": "long",  # among {short, long, vert, horz}
        "interpolation": "linear",
        "align_corners": None,  # unused (cv2 semantics); kept for conf parity
        "antialias": True,
        "square_pad": False,
        "add_padding_mask": False,
        # pad the image buffer (zeros) up to the next multiple — keeps
        # `image_size` at the true size so models can mask the pad region;
        # bounds the number of distinct XLA compilations across an eval set
        "pad_to_multiple": None,
    }

    def __init__(self, conf=None):
        self.conf = merge(Config(self.default_conf), conf or {})

    def target_size(self, h: int, w: int):
        conf = self.conf
        size = conf.resize
        if size is None:
            nw, nh = w, h
        else:
            side = conf.side
            if side == "vert":
                scale = size / h
            elif side == "horz":
                scale = size / w
            elif (side == "short") ^ (w < h):
                scale = size / h
            else:
                scale = size / w
            nw, nh = int(round(w * scale)), int(round(h * scale))
        if conf.edge_divisible_by is not None:
            d = conf.edge_divisible_by
            nw, nh = (nw // d) * d, (nh // d) * d
        return nw, nh

    def __call__(self, img: np.ndarray) -> dict:
        """img: float32 HWC in [0,1]. Returns dict with keys:
        image (H', W', C), image_size (2,) [w, h], scales (2,), orig_size,
        and optionally padding_mask."""
        h, w = img.shape[:2]
        nw, nh = self.target_size(h, w)
        if (nw, nh) != (w, h):
            interp = self.conf.interpolation
            if self.conf.antialias and (nw < w or nh < h) and interp == "linear":
                interp = "area"  # cv2's antialiased downsampling
            img, scales = resize_image(img, (nw, nh), interp)
        else:
            scales = np.array([1.0, 1.0], dtype=np.float32)
        out = {
            "image": img,
            "image_size": np.array([img.shape[1], img.shape[0]], dtype=np.float32),
            "scales": scales,
            "original_image_size": np.array([w, h], dtype=np.float32),
            # 3x3 pixel-coordinate transform original -> processed
            "transform": np.diag([scales[0], scales[1], 1.0]).astype(np.float32),
        }
        if self.conf.square_pad:
            side = max(img.shape[0], img.shape[1])
            padded = np.zeros((side, side, img.shape[2]), dtype=img.dtype)
            padded[: img.shape[0], : img.shape[1]] = img
            mask = np.zeros((side, side), dtype=bool)
            mask[: img.shape[0], : img.shape[1]] = True
            out["padding_mask"] = mask
            out["image"] = padded
        if self.conf.pad_to_multiple:
            m = int(self.conf.pad_to_multiple)
            img_c = out["image"]
            ph = -(-img_c.shape[0] // m) * m
            pw = -(-img_c.shape[1] // m) * m
            if (ph, pw) != img_c.shape[:2]:
                padded = np.zeros((ph, pw, img_c.shape[2]), dtype=img_c.dtype)
                padded[: img_c.shape[0], : img_c.shape[1]] = img_c
                out["image"] = padded
        return out


def numpy_image_batch(images: list[np.ndarray]) -> np.ndarray:
    """Stack equally-sized HWC images into NHWC."""
    return np.stack(images, axis=0)
