"""DeepLSD learned line detection (role of reference
`models/lines/deeplsd.py:9-106`, which wraps the `deeplsd` torch package).

Two backends:

  - ``backend: native`` (default): a TPU-native re-design of the DeepLSD
    idea (Pautrat et al., CVPR 2023) — a UNet predicts a normalized
    line distance field (DF) and a line angle field (AF); segments are
    vectorized from the fields on the host. The network and losses are
    fully trainable in this framework (GT fields derive on-device from any
    line source via `fields_from_lines`, e.g. the LSD pseudo-labels the
    paper uses). The vectorizer is an original field-guided design
    (thresholded-DF probabilistic Hough + DF/AF validation + segment NMS)
    rather than a translation of the package's modified-LSD C++ — the
    official checkpoint therefore has no converter (layouts differ by
    construction); the net trains from scratch.
  - ``backend: package``: host callback into the `deeplsd` torch package
    when it is installed locally (zero-egress: no auto-download), exactly
    like the reference wrapper.

Output contract matches `lsd.py`: ``lines (B, L, 2, 2)`` xy endpoints,
``line_scores (B, L)`` (sqrt-length scaled, normalized to max 1),
``line_mask (B, L)``.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...settings import DATA_PATH
from ..base_model import BaseModel


# ---------------------------------------------------------------------------
# GT fields from line segments (on-device; used for training supervision and
# for the synthetic-field tests)
# ---------------------------------------------------------------------------


def fields_from_lines(
    lines: jnp.ndarray,
    line_mask: jnp.ndarray | None,
    h: int,
    w: int,
    d_max: float = 5.0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Line segments -> (normalized distance field, angle field).

    lines (B, L, 2, 2) xy endpoints (COLMAP pixel centers), line_mask (B, L).
    Returns df (B, h, w) in [0, 1] (point-to-nearest-segment distance
    clipped at `d_max` and divided by it) and angle (B, h, w) in [0, pi)
    (orientation of the nearest segment). Masked / degenerate segments never
    win. With no valid segment, df = 1 and angle = 0 everywhere.

    Memory: distances are computed row-chunk by row-chunk with `lax.map`
    (a (w, L) tile at a time), never materializing (h*w, L).
    """
    B, L = lines.shape[:2]
    if line_mask is None:
        line_mask = jnp.ones((B, L), bool)
    a = lines[:, :, 0]  # (B, L, 2)
    b = lines[:, :, 1]
    ab = b - a
    len2 = (ab**2).sum(-1)  # (B, L)
    valid = line_mask & (len2 > 1e-6)
    theta = jnp.mod(jnp.arctan2(ab[..., 1], ab[..., 0]), math.pi)  # (B, L)

    xs = jnp.arange(w, dtype=jnp.float32) + 0.5
    ys = jnp.arange(h, dtype=jnp.float32) + 0.5

    def one_image(args):
        a_i, ab_i, len2_i, valid_i, theta_i = args

        def one_row(y):
            p = jnp.stack([xs, jnp.full_like(xs, y)], -1)  # (w, 2)
            pa = p[:, None, :] - a_i[None, :, :]  # (w, L, 2)
            t = (pa * ab_i[None]).sum(-1) / jnp.maximum(len2_i[None], 1e-6)
            t = jnp.clip(t, 0.0, 1.0)
            closest = a_i[None] + t[..., None] * ab_i[None]  # (w, L, 2)
            d = jnp.linalg.norm(p[:, None] - closest, axis=-1)  # (w, L)
            d = jnp.where(valid_i[None], d, jnp.inf)
            idx = jnp.argmin(d, axis=-1)  # (w,)
            dmin = jnp.take_along_axis(d, idx[:, None], axis=1)[:, 0]
            ang = theta_i[idx]
            any_valid = valid_i.any()
            dmin = jnp.where(any_valid, dmin, jnp.inf)
            ang = jnp.where(any_valid, ang, 0.0)
            return jnp.minimum(dmin, d_max) / d_max, ang

        df_rows, ang_rows = jax.lax.map(one_row, ys)
        return df_rows, ang_rows

    df, ang = jax.vmap(lambda *xs_: one_image(xs_))(a, ab, len2, valid, theta)
    return df, ang


# ---------------------------------------------------------------------------
# the DF/AF network
# ---------------------------------------------------------------------------


class _ConvBlock(nn.Module):
    ch: int

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Conv(self.ch, (3, 3), padding="SAME")(x))
        x = nn.relu(nn.Conv(self.ch, (3, 3), padding="SAME")(x))
        return x


class DeepLSDNet(nn.Module):
    """UNet -> (df (B, H, W) in [0,1], angle (B, H, W) in [0, pi)).

    VGG-style blocks (as the paper's backbone family), 3 down / 3 up with
    skip connections; sigmoid DF head (normalized distance), sigmoid*pi
    angle head. H and W must be multiples of 8.
    """

    channels: tuple = (64, 128, 256)

    @nn.compact
    def __call__(self, image):  # image (B, H, W, 1..3)
        from ..extractors.superpoint import rgb_to_grayscale

        image = rgb_to_grayscale(image)
        skips = []
        x = image
        for ch in self.channels:
            x = _ConvBlock(ch)(x)
            skips.append(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = _ConvBlock(2 * self.channels[-1])(x)
        for ch, skip in zip(reversed(self.channels), reversed(skips)):
            B, Hc, Wc, C = x.shape
            x = jax.image.resize(x, (B, 2 * Hc, 2 * Wc, C), "nearest")
            x = nn.Conv(ch, (3, 3), padding="SAME")(x)
            x = jnp.concatenate([x, skip], axis=-1)
            x = _ConvBlock(ch)(x)
        df = nn.sigmoid(nn.Conv(1, (1, 1))(x))[..., 0]
        angle = nn.sigmoid(nn.Conv(1, (1, 1))(x))[..., 0] * math.pi
        return df, angle


class DeepLSDPackageNet(nn.Module):
    """Official-layout DF/AF UNet for converted `deeplsd_md.tar` weights
    (the package's `deeplsd.models.deeplsd_inference.DeepLSD`, loaded by the
    reference at `models/lines/deeplsd.py:30-43`).

    Mirrors the package's VGGUNet + two Sequential heads so `convert_deeplsd`
    (compat/torch_conversion.py) can map the official checkpoint tensor by
    tensor. The topology assumptions (documented here because the package is
    not installable in this zero-egress environment; validated by shape
    checks in the converter and pending executing-package parity):

      - encoder blocks of 3x3 conv -> BN -> ReLU, max-pool between blocks;
      - decoder blocks preceded by bilinear 2x upsampling and skip
        concatenation with the mirrored encoder block (skip first — the
        standard torch-UNet ``cat([skip, x], dim=1)`` order);
      - heads: two (3x3 conv -> ReLU -> BN) then a 1x1 conv; the DF head
        ends in ReLU and predicts the log-normalized distance
        ``df_norm = -log(d / r)`` (so the true distance is
        ``exp(-df_norm) * r`` with r = line_neighborhood = 5 px), the angle
        head ends in sigmoid scaled to [0, pi).

    Outputs are converted to this framework's conventions: ``df`` in [0, 1]
    (distance / d_max clipped) and ``angle`` in [0, pi) — drop-in for the
    shared field vectorizer.
    """

    enc: tuple = ((64, 64), (128, 128), (256, 256), (256, 256))
    dec: tuple = ((128, 128), (64, 64), (64, 64))
    head: tuple = (64, 64)
    skip_first: bool = True

    @nn.compact
    def __call__(self, image, train: bool = False):
        from ..extractors.superpoint import rgb_to_grayscale

        x = rgb_to_grayscale(image)
        skips = []
        for bi, block in enumerate(self.enc):
            for ci, ch in enumerate(block):
                x = nn.Conv(ch, (3, 3), padding="SAME", name=f"enc{bi}_conv{ci}")(x)
                x = nn.BatchNorm(
                    use_running_average=not train,
                    momentum=0.9,
                    epsilon=1e-5,
                    name=f"enc{bi}_bn{ci}",
                )(x)
                x = nn.relu(x)
            if bi < len(self.enc) - 1:
                skips.append(x)
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        for bi, block in enumerate(self.dec):
            B, Hc, Wc, C = x.shape
            x = jax.image.resize(x, (B, 2 * Hc, 2 * Wc, C), "bilinear")
            skip = skips[-(bi + 1)]
            x = jnp.concatenate([skip, x] if self.skip_first else [x, skip], -1)
            for ci, ch in enumerate(block):
                x = nn.Conv(ch, (3, 3), padding="SAME", name=f"dec{bi}_conv{ci}")(x)
                x = nn.BatchNorm(
                    use_running_average=not train,
                    momentum=0.9,
                    epsilon=1e-5,
                    name=f"dec{bi}_bn{ci}",
                )(x)
                x = nn.relu(x)

        def run_head(h, name):
            for ci, ch in enumerate(self.head):
                h = nn.Conv(ch, (3, 3), padding="SAME", name=f"{name}_conv{ci}")(h)
                h = nn.relu(h)
                h = nn.BatchNorm(
                    use_running_average=not train,
                    momentum=0.9,
                    epsilon=1e-5,
                    name=f"{name}_bn{ci}",
                )(h)
            return nn.Conv(1, (1, 1), name=f"{name}_out")(h)[..., 0]

        df_norm = nn.relu(run_head(x, "df"))
        angle = nn.sigmoid(run_head(x, "angle")) * math.pi
        # package convention -> ours: true distance = exp(-df_norm) * r,
        # ours = clip(distance / d_max, 0, 1) with d_max = r
        df = jnp.minimum(jnp.exp(-df_norm), 1.0)
        return df, angle


def field_losses(
    pred_df: jnp.ndarray,
    pred_angle: jnp.ndarray,
    gt_df: jnp.ndarray,
    gt_angle: jnp.ndarray,
) -> dict:
    """DeepLSD-style supervision: L1 on the normalized DF; circular (mod pi)
    angular error weighted toward pixels near lines (w = 1 - df_gt)."""
    l_df = jnp.abs(pred_df - gt_df).mean((-2, -1))
    dtheta = jnp.abs(pred_angle - gt_angle)
    dtheta = jnp.minimum(dtheta, math.pi - dtheta) / math.pi
    wgt = 1.0 - gt_df
    l_angle = (wgt * dtheta).sum((-2, -1)) / jnp.maximum(wgt.sum((-2, -1)), 1.0)
    return {"df": l_df, "angle": l_angle, "total": l_df + l_angle}


# ---------------------------------------------------------------------------
# field -> segments vectorizer (host)
# ---------------------------------------------------------------------------


def lines_from_fields_host(
    df: np.ndarray,
    angle: np.ndarray,
    max_lines: int,
    min_length: float = 15.0,
    df_thresh: float = 0.45,
    angle_tol: float = math.pi / 9,
    d_max: float = 5.0,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorize segments from (B, H, W) normalized DF + AF.

    Field-guided probabilistic Hough: candidate segments from
    `cv2.HoughLinesP` on the thresholded DF, validated by the median DF and
    the AF agreement along the segment, deduplicated with a
    perpendicular-distance segment NMS, scored sqrt(length) * (1 - med_df)
    and normalized to max 1 (as `lsd.py`). Returned endpoints use the
    COLMAP pixel-center convention (+0.5 on HoughLinesP's array indices).

    All cv2 use is serialized behind CV2_LOCK and exceptions degrade to
    "no lines" — the cv2-in-pure_callback protocol of `lsd.py`."""
    B, H, W = df.shape
    L = max_lines
    out_lines = np.zeros((B, L, 2, 2), np.float32)
    out_scores = np.zeros((B, L), np.float32)
    out_valid = np.zeros((B, L), bool)
    try:
        from ...utils.hostlock import CV2_LOCK

        with CV2_LOCK:
            _lines_from_fields_locked(
                df, angle, L, min_length, df_thresh, angle_tol, d_max,
                out_lines, out_scores, out_valid,
            )
    except Exception as e:  # pragma: no cover - defensive
        import sys

        print(f"[deeplsd] vectorization failed, no lines: {e}", file=sys.stderr)
    return out_lines, out_scores, out_valid


def _lines_from_fields_locked(
    df, angle, L, min_length, df_thresh, angle_tol, d_max,
    out_lines, out_scores, out_valid,
):
    import cv2

    B, H, W = df.shape
    for bi in range(B):
        mask = (df[bi] < df_thresh).astype(np.uint8) * 255
        segs = cv2.HoughLinesP(
            mask,
            rho=1.0,
            theta=math.pi / 180.0,
            threshold=int(max(10, min_length // 2)),
            minLineLength=int(min_length),
            maxLineGap=4,
        )
        if segs is None:
            continue
        segs = np.asarray(segs, np.float32).reshape(-1, 4)  # x1 y1 x2 y2
        cands = []
        for x1, y1, x2, y2 in segs:
            length = math.hypot(x2 - x1, y2 - y1)
            if length < min_length:
                continue
            n = max(int(length), 2)
            ts = np.linspace(0, 1, n)
            xs = np.clip((x1 + ts * (x2 - x1)).round().astype(int), 0, W - 1)
            ys = np.clip((y1 + ts * (y2 - y1)).round().astype(int), 0, H - 1)
            med_df = float(np.median(df[bi, ys, xs]))
            if med_df > df_thresh:
                continue
            seg_theta = math.atan2(y2 - y1, x2 - x1) % math.pi
            dth = np.abs(angle[bi, ys, xs] - seg_theta)
            dth = np.minimum(dth, math.pi - dth)
            if float(np.median(dth)) > angle_tol:
                continue
            score = math.sqrt(length) * (1.0 - med_df)
            cands.append((score, x1, y1, x2, y2, seg_theta))
        if not cands:
            continue
        cands.sort(key=lambda c: -c[0])

        # segment NMS: drop candidates whose midpoint lies near a kept
        # segment's support line with a similar orientation and overlapping
        # projection
        kept = []
        for score, x1, y1, x2, y2, th in cands:
            mid = np.asarray([(x1 + x2) / 2, (y1 + y2) / 2])
            dup = False
            for _, kx1, ky1, kx2, ky2, kth in kept:
                dth = abs(th - kth)
                dth = min(dth, math.pi - dth)
                if dth > angle_tol:
                    continue
                ka = np.asarray([kx1, ky1])
                kd = np.asarray([kx2 - kx1, ky2 - ky1])
                klen2 = float((kd**2).sum())
                t = float(np.dot(mid - ka, kd)) / max(klen2, 1e-6)
                perp = float(
                    np.linalg.norm(mid - (ka + np.clip(t, 0, 1) * kd))
                )
                if -0.1 <= t <= 1.1 and perp <= d_max:
                    dup = True
                    break
            if not dup:
                kept.append((score, x1, y1, x2, y2, th))
            if len(kept) >= L:
                break

        n = len(kept)
        arr = np.asarray([[k[1], k[2], k[3], k[4]] for k in kept], np.float32)
        # Hough endpoints are array indices; +0.5 -> COLMAP pixel centers
        out_lines[bi, :n, 0] = arr[:, :2] + 0.5
        out_lines[bi, :n, 1] = arr[:, 2:] + 0.5
        scores = np.asarray([k[0] for k in kept], np.float32)
        out_scores[bi, :n] = scores / max(float(scores.max()), 1e-6)
        out_valid[bi, :n] = True


# ---------------------------------------------------------------------------
# the model
# ---------------------------------------------------------------------------


class DeepLSD(BaseModel):
    default_conf = {
        "backend": "native",  # "native" | "package"
        "max_num_lines": 250,
        "min_length": 15.0,
        "df_thresh": 0.45,
        "angle_tol": math.pi / 9,
        "d_max": 5.0,  # DF normalization radius (px)
        "detect_in_train": False,  # also vectorize during training forwards
        "channels": [64, 128, 256],
        # package-layout backend: block widths of the converted official
        # net; None = DeepLSDPackageNet defaults (deeplsd_md.tar layout)
        "package_spec": None,
        "trainable": True,
        # package backend only:
        "weights_path": "weights/deeplsd_md.tar",  # under DATA_PATH
    }
    required_data_keys = ["image"]

    def setup(self):
        if self.conf.backend == "native":
            self.net = DeepLSDNet(channels=tuple(self.conf.channels))
        elif self.conf.backend == "package-layout":
            # official-layout net for converted deeplsd_md.tar weights
            # (convert_deeplsd emits params/batch_stats + a spec dict; pass
            # non-default shapes via conf.package_spec)
            spec = self.conf.get("package_spec") or {}
            self.net = DeepLSDPackageNet(
                enc=tuple(tuple(b) for b in spec.get("enc", DeepLSDPackageNet.enc)),
                dec=tuple(tuple(b) for b in spec.get("dec", DeepLSDPackageNet.dec)),
                head=tuple(spec.get("head", DeepLSDPackageNet.head)),
            )
        else:
            try:
                import deeplsd  # noqa: F401
            except ImportError as e:
                raise ImportError(
                    "backend='package' requires the `deeplsd` package and "
                    f"weights (expected under {DATA_PATH / self.conf.weights_path});"
                    " unavailable in this environment — use backend='native'"
                    " or `lsd` instead."
                ) from e

    # ------------------------------------------------------------- native
    def _forward_native(self, data: dict, train: bool) -> dict:
        image = data["image"]
        df, angle = self.net(image)
        pred = {"df": df, "angle": angle}
        if train and not self.conf.detect_in_train:
            # training supervises the fields; vectorization is inference-only
            return pred
        B = image.shape[0]
        L = int(self.conf.max_num_lines)
        shapes = (
            jax.ShapeDtypeStruct((B, L, 2, 2), jnp.float32),
            jax.ShapeDtypeStruct((B, L), jnp.float32),
            jax.ShapeDtypeStruct((B, L), jnp.bool_),
        )
        lines, scores, valid = jax.pure_callback(
            lambda d, a: lines_from_fields_host(
                np.asarray(d, np.float32),
                np.asarray(a, np.float32),
                L,
                float(self.conf.min_length),
                float(self.conf.df_thresh),
                float(self.conf.angle_tol),
                float(self.conf.d_max),
            ),
            shapes,
            df.astype(jnp.float32),
            angle.astype(jnp.float32),
        )
        pred.update({"lines": lines, "line_scores": scores, "line_mask": valid})
        return pred

    # ------------------------------------------------------------ package
    def _detect_host(self, images: np.ndarray):
        import torch
        from deeplsd.models.deeplsd_inference import DeepLSD as _DeepLSD

        if not hasattr(self, "_net"):
            ckpt = torch.load(
                DATA_PATH / self.conf.weights_path, map_location="cpu"
            )
            net = _DeepLSD({"detect_lines": True, "line_detection_params": {}})
            net.load_state_dict(ckpt["model"])
            self._net = net.eval()
        L = int(self.conf.max_num_lines)
        B = images.shape[0]
        out_lines = np.zeros((B, L, 2, 2), np.float32)
        out_scores = np.zeros((B, L), np.float32)
        out_valid = np.zeros((B, L), bool)
        for b in range(B):
            gray = (images[b].mean(-1) * 255).astype(np.float32)
            with torch.no_grad():
                pred = self._net(
                    {"image": torch.from_numpy(gray)[None, None] / 255.0}
                )
            segs = pred["lines"][0]
            lengths = np.linalg.norm(segs[:, 1] - segs[:, 0], axis=-1)
            keep = lengths >= self.conf.min_length
            segs, lengths = segs[keep], lengths[keep]
            if len(segs) == 0:
                continue
            scores = np.sqrt(lengths)
            order = np.argsort(-scores)[:L]
            n = len(order)
            out_lines[b, :n] = segs[order]
            out_scores[b, :n] = scores[order] / max(scores.max(), 1e-6)
            out_valid[b, :n] = True
        return out_lines, out_scores, out_valid

    def _forward_package(self, data: dict) -> dict:
        image = data["image"]
        B = image.shape[0]
        L = int(self.conf.max_num_lines)
        shapes = (
            jax.ShapeDtypeStruct((B, L, 2, 2), jnp.float32),
            jax.ShapeDtypeStruct((B, L), jnp.float32),
            jax.ShapeDtypeStruct((B, L), jnp.bool_),
        )
        lines, scores, valid = jax.pure_callback(
            lambda img: self._detect_host(np.asarray(img)), shapes, image
        )
        return {"lines": lines, "line_scores": scores, "line_mask": valid}

    def _forward(self, data: dict, train: bool = False) -> dict:
        if self.conf.backend in ("native", "package-layout"):
            # the package-layout net emits the same (df, angle) conventions,
            # so the field vectorizer path is shared
            return self._forward_native(data, train)
        return self._forward_package(data)

    def loss(self, pred: dict, data: dict, train: bool = False):
        """Field supervision from any line source in the batch (e.g. the
        LSD pseudo-labels of `data.detect_lines`): GT DF/AF derive on-device
        via `fields_from_lines`."""
        if self.conf.backend != "native":
            raise NotImplementedError("package backend is inference-only")
        h, w = pred["df"].shape[-2:]
        gt_df, gt_angle = fields_from_lines(
            data["lines"], data.get("line_mask"), h, w, float(self.conf.d_max)
        )
        losses = field_losses(pred["df"], pred["angle"], gt_df, gt_angle)
        return losses, {}
