"""Photometric augmentation pipelines (role of reference
`datasets/augmentations.py`, which uses albumentations — unavailable here, so
the same augmentation families are implemented directly on numpy/cv2).

Families (reference :173-243):
  - "identity": no-op
  - "dark": aggressive low-light simulation — gamma darkening, motion blur,
    ISO noise, JPEG compression (DarkAugmentation)
  - "lg": the LightGlue training recipe — hue shift, gamma, blur/motion blur,
    noise, JPEG, CLAHE, random additive shade (LGAugmentation)

All operate on float32 HWC RGB images in [0, 1] with a numpy Generator for
reproducibility (per-item seeding is the dataset's job).
"""

from __future__ import annotations

import cv2
import numpy as np

from ..core.config import Config, merge


def _to_u8(img):
    return np.clip(img * 255.0, 0, 255).astype(np.uint8)


def _to_f32(img):
    return img.astype(np.float32) / 255.0


def apply_gamma(img, gamma):
    return np.clip(img, 0, 1) ** gamma


def apply_hue_shift(img, delta):
    """delta in degrees (OpenCV hue is [0,180))."""
    hsv = cv2.cvtColor(_to_u8(img), cv2.COLOR_RGB2HSV).astype(np.int16)
    hsv[..., 0] = (hsv[..., 0] + int(delta)) % 180
    out = cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2RGB)
    return _to_f32(out)


def apply_blur(img, ksize):
    k = max(int(ksize) | 1, 3)
    return cv2.GaussianBlur(img, (k, k), 0)


def apply_motion_blur(img, ksize, angle):
    k = max(int(ksize) | 1, 3)
    kernel = np.zeros((k, k), np.float32)
    kernel[k // 2, :] = 1.0
    M = cv2.getRotationMatrix2D((k / 2 - 0.5, k / 2 - 0.5), angle, 1.0)
    kernel = cv2.warpAffine(kernel, M, (k, k))
    kernel = kernel / max(kernel.sum(), 1e-6)
    return cv2.filter2D(img, -1, kernel)


def apply_iso_noise(img, rng, color_shift=0.02, intensity=0.1):
    """Approximate ISO noise: luminance Poisson-ish + chroma gaussian."""
    noise_l = rng.normal(0.0, intensity * 0.1, img.shape[:2])[..., None]
    noise_c = rng.normal(0.0, color_shift, img.shape)
    return np.clip(img + noise_l + noise_c, 0, 1).astype(np.float32)


def apply_jpeg(img, quality):
    ok, enc = cv2.imencode(".jpg", _to_u8(img)[..., ::-1], [cv2.IMWRITE_JPEG_QUALITY, int(quality)])
    dec = cv2.imdecode(enc, cv2.IMREAD_COLOR)[..., ::-1]
    return _to_f32(dec)


def apply_clahe(img, clip=4.0):
    lab = cv2.cvtColor(_to_u8(img), cv2.COLOR_RGB2LAB)
    clahe = cv2.createCLAHE(clipLimit=clip, tileGridSize=(8, 8))
    lab[..., 0] = clahe.apply(lab[..., 0])
    return _to_f32(cv2.cvtColor(lab, cv2.COLOR_LAB2RGB))


def random_shade(img, rng, nb_ellipses=20, transparency_range=(-0.5, 0.8), kernel_size_range=(250, 350)):
    """Random additive ellipse shading (reference `augmentations.py:19-73`)."""
    h, w = img.shape[:2]
    min_dim = min(h, w) / 4
    mask = np.zeros((h, w), np.uint8)
    for _ in range(nb_ellipses):
        ax = int(max(rng.random() * min_dim, min_dim / 5))
        ay = int(max(rng.random() * min_dim, min_dim / 5))
        max_rad = max(ax, ay)
        x = rng.integers(max_rad, max(w - max_rad, max_rad + 1))
        y = rng.integers(max_rad, max(h - max_rad, max_rad + 1))
        angle = rng.random() * 90
        cv2.ellipse(mask, (int(x), int(y)), (ax, ay), angle, 0, 360, 255, -1)
    transparency = rng.uniform(*transparency_range)
    ks = int(rng.integers(*kernel_size_range))
    if (ks % 2) == 0:
        ks += 1
    mask = cv2.GaussianBlur(mask.astype(np.float32), (ks, ks), 0)
    out = img * (1 - transparency * mask[..., None] / 255.0)
    return np.clip(out, 0, 1).astype(np.float32)


class BaseAugmentation:
    default_conf: dict = {"p": 1.0}

    def __init__(self, conf=None):
        self.conf = merge(Config(self.default_conf), conf or {})

    def __call__(self, image: np.ndarray, rng: np.random.Generator | None = None) -> np.ndarray:
        from ..utils.hostlock import CV2_LOCK

        if rng is None:
            rng = np.random.default_rng()
        if image.shape[-1] == 1:
            image = np.repeat(image, 3, axis=-1)
        with CV2_LOCK:
            return self.apply(image, rng)

    def apply(self, image, rng):
        return image


class IdentityAugmentation(BaseAugmentation):
    def apply(self, image, rng):
        return image


class DarkAugmentation(BaseAugmentation):
    """Low-light simulation (reference `augmentations.py:173-218`)."""

    default_conf = {"p": 0.75}

    def apply(self, image, rng):
        if rng.random() < self.conf.p:
            image = apply_gamma(image, rng.uniform(1.5, 3.0))
            if rng.random() < 0.5:
                image = apply_motion_blur(image, rng.integers(3, 8), rng.uniform(0, 360))
            elif rng.random() < 0.5:
                image = apply_blur(image, rng.integers(3, 7))
            if rng.random() < 0.5:
                image = apply_iso_noise(image, rng)
            if rng.random() < 0.7:
                image = apply_jpeg(image, rng.integers(10, 60))
        return image.astype(np.float32)


class LGAugmentation(BaseAugmentation):
    """LightGlue training augmentation (reference `augmentations.py:221-243`)."""

    default_conf = {"p": 0.95}

    def apply(self, image, rng):
        if rng.random() < self.conf.p:
            if rng.random() < 0.5:
                image = apply_hue_shift(image, rng.integers(-15, 15))
            if rng.random() < 0.5:
                image = apply_gamma(image, rng.uniform(0.6, 1.6))
            r = rng.random()
            if r < 0.2:
                image = apply_blur(image, rng.integers(3, 7))
            elif r < 0.4:
                image = apply_motion_blur(image, rng.integers(3, 8), rng.uniform(0, 360))
            if rng.random() < 0.3:
                image = apply_iso_noise(image, rng)
            if rng.random() < 0.3:
                image = apply_clahe(image)
            if rng.random() < 0.3:
                image = apply_jpeg(image, rng.integers(30, 90))
            if rng.random() < 0.2:
                image = random_shade(image, rng)
        return image.astype(np.float32)


augmentations = {
    "identity": IdentityAugmentation,
    "dark": DarkAugmentation,
    "lg": LGAugmentation,
}
