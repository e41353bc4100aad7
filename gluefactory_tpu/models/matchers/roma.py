"""RoMa dense warp -> sparse match machinery, TPU-native.

Implements the backbone-independent logic of reference
`models/matchers/roma.py:44-153,401-441` as pure jnp:

  - `flow_to_warp` (reference :44-93): dense flow logits -> clamped warp +
    sigmoid certainty, with low-res certainty subtraction and out-of-range
    zeroing.
  - `match_keypoints_dense` (reference :95-153): snap given keypoints through
    the dense warp — sample the warp at query keypoints, find the nearest
    target keypoint, gate by `max_kp_error` pixels, mutual check, and
    certainty threshold. Mask-aware: padded keypoint slots (keypoint_mask)
    never match.
  - `cycle_dist` (reference `utils/image.py:232-242`): warp round-trip error.
  - `sample_matches` (reference :401-441 + romatch's `threshold_balanced`
    sampler): certainty-thresholded, KDE-balanced sampling of sparse matches
    from the dense warp, static-shape (returns exactly `num` matches).

The network itself is native too (`roma_net.py`: DINOv2-L coarse encoder +
VGG19-BN fine pyramid + cosine-kernel GP + anchor-classification decoder +
depthwise ConvRefiners, `backend: native`); the `RoMa` model alternatively
consumes any dense warp + certainty source: precomputed `warp0/certainty0`
(e.g. from a cache) or raw `flow0/certainty_logits0` pyramid outputs
(`backend: data`). Coordinate conventions reproduce the
reference exactly, including its mixed align-corners usage
(`normalize_coords`/`denormalize_coords` use the (W-1) align-corners=True
convention, reference `utils/image.py:212-229`, while grid sampling is
align_corners=False, reference `utils/image.py:136-156`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...ops.grid_sample import grid_sample_nd
from ..base_model import BaseModel
from .roma_net import NET_DEFAULT_CONF, RoMaNet


# ---------------------------------------------------------------------------
# coordinate helpers (reference utils/image.py:159-229)
# ---------------------------------------------------------------------------


def get_pixel_grid(h: int, w: int, normalized: bool = False) -> jnp.ndarray:
    """(H, W, 2) [x, y] grid of pixel centers (+0.5, COLMAP); `normalized`
    maps to [-1, 1] with the align_corners=False convention (reference
    `utils/image.py:159-199`)."""
    x = jnp.arange(w, dtype=jnp.float32) + 0.5
    y = jnp.arange(h, dtype=jnp.float32) + 0.5
    grid = jnp.stack(jnp.meshgrid(x, y, indexing="xy"), axis=-1)
    if normalized:
        grid = grid * (2.0 / jnp.asarray([w, h], jnp.float32)) - 1.0
    return grid


def normalize_coords(coords: jnp.ndarray, hw: tuple[int, int]) -> jnp.ndarray:
    """[0, W/H] COLMAP -> [-1, 1], (W-1) convention (reference :222-229)."""
    h, w = hw
    scale = jnp.asarray([w - 1, h - 1], jnp.float32)
    return coords / scale * 2.0 - 1.0


def denormalize_coords(coords: jnp.ndarray, hw: tuple[int, int]) -> jnp.ndarray:
    """[-1, 1] -> [0, W/H] COLMAP, (W-1) convention (reference :212-219)."""
    h, w = hw
    scale = jnp.asarray([w - 1, h - 1], jnp.float32)
    return (coords + 1.0) / 2.0 * scale


def grid_sample_normalized(fmap: jnp.ndarray, ncoords: jnp.ndarray) -> jnp.ndarray:
    """Sample fmap (B, H, W, C) at normalized coords (B, N, 2) in [-1, 1]
    with torch grid_sample semantics (align_corners=False, zeros padding):
    array index = (n + 1)/2 * W - 0.5."""
    B, H, W, _ = fmap.shape
    size = jnp.asarray([W, H], jnp.float32)
    pts = (ncoords + 1.0) / 2.0 * size  # COLMAP coords for grid_sample_nd
    return grid_sample_nd(fmap, pts)


# ---------------------------------------------------------------------------
# flow -> warp (reference roma.py:44-93)
# ---------------------------------------------------------------------------


def flow_to_warp(
    flow: jnp.ndarray,
    certainty_logits: jnp.ndarray,
    lr_certainty: jnp.ndarray | None = None,
    extract_query_coords: bool = False,
) -> dict:
    """flow (B, H, W, 2) normalized target coords; certainty_logits (B, H, W).

    Returns {"warp": (B, H, W, 2) clamped to [-1, 1],
             "certainty": (B, H, W) probs, zeroed where the flow left the
             image} (+ "q_coords" when requested).
    """
    B, H, W = certainty_logits.shape[:3]
    if lr_certainty is not None:
        # reference :54-63: upsample the coarse certainty, keep only its
        # negative (logit < 0) part scaled by 0.5, and subtract
        lr = jax.image.resize(lr_certainty, (B, H, W), method="linear")
        lr = 0.5 * lr * (lr < 0.0)
        certainty_logits = certainty_logits - lr
    certainty = jax.nn.sigmoid(certainty_logits)
    out_of_range = (jnp.abs(flow) > 1.0).any(axis=-1)
    certainty = jnp.where(out_of_range, 0.0, certainty)
    warp = jnp.clip(flow, -1.0, 1.0)
    pred = {"warp": warp, "certainty": certainty}
    if extract_query_coords:
        # reference :78-89: linspace(-1 + 1/h, 1 - 1/h, h) == pixel centers
        q = get_pixel_grid(H, W, normalized=True)
        pred["q_coords"] = jnp.tile(q[None], (B, 1, 1, 1))
    return pred


# ---------------------------------------------------------------------------
# cycle consistency (reference utils/image.py:232-242)
# ---------------------------------------------------------------------------


def cycle_dist(q_to_ref: jnp.ndarray, ref_to_q: jnp.ndarray) -> jnp.ndarray:
    """Round-trip error in pixels: |grid - denorm(ref_to_q(q_to_ref))|.

    q_to_ref, ref_to_q: (B, H, W, 2) normalized warps. Returns (B, H, W).
    """
    B, H, W, _ = q_to_ref.shape
    back = grid_sample_normalized(ref_to_q, q_to_ref.reshape(B, H * W, 2))
    back = back.reshape(B, H, W, 2)
    grid = get_pixel_grid(H, W, normalized=False)[None]
    return jnp.linalg.norm(grid - denormalize_coords(back, (H, W)), axis=-1)


# ---------------------------------------------------------------------------
# keypoint snapping (reference roma.py:95-153)
# ---------------------------------------------------------------------------


def match_keypoints_dense(
    pred: dict,
    data: dict,
    max_kp_error: float,
    filter_threshold: float,
    mutual_check: bool = True,
) -> dict:
    """Match existing keypoints through the dense warps.

    pred: warp0/certainty0 (query->support) and warp1/certainty1.
    data: keypoints0/1 (COLMAP), view images or image sizes, optional
    keypoint_mask0/1 — masked slots never produce nor receive matches.
    """

    def hw(view, img_key="image"):
        if "image" in view:
            return tuple(view["image"].shape[1:3])
        size = view["image_size"]  # (B, 2) [w, h] — static per batch
        return (int(size[0, 1]), int(size[0, 0]))

    hw0 = hw(data["view0"])
    hw1 = hw(data["view1"])
    kpts0, kpts1 = data["keypoints0"], data["keypoints1"]
    mask0 = data.get("keypoint_mask0")
    mask1 = data.get("keypoint_mask1")

    def find_matches(kq, kt, warp, cert, q_hw, t_hw, mq, mt):
        nq = normalize_coords(kq, q_hw)  # (B, N, 2)
        kq_to_t = grid_sample_normalized(warp, nq)  # (B, N, 2) normalized
        scores = grid_sample_normalized(cert[..., None], nq)[..., 0]  # (B, N)
        kq_to_t = denormalize_coords(kq_to_t, t_hw)
        dist = jnp.linalg.norm(
            kq_to_t[:, :, None, :] - kt[:, None, :, :], axis=-1
        )  # (B, Nq, Nt)
        if mt is not None:
            dist = jnp.where(mt[:, None, :], dist, jnp.inf)
        matches = jnp.argmin(dist, axis=-1)
        match_dist = jnp.min(dist, axis=-1)
        valid = jnp.isfinite(match_dist) & (match_dist < max_kp_error)
        if mutual_check:
            rev = jnp.argmin(dist, axis=-2)  # (B, Nt): best query per target
            back = jnp.take_along_axis(rev, matches, axis=-1)
            valid = valid & (back == jnp.arange(kq.shape[1])[None])
        valid = valid & (scores > filter_threshold)
        if mq is not None:
            valid = valid & mq
        return (
            jnp.where(valid, matches, -1).astype(jnp.int32),
            jnp.where(valid, scores, 0.0),
        )

    m0, s0 = find_matches(
        kpts0, kpts1, pred["warp0"], pred["certainty0"], hw0, hw1, mask0, mask1
    )
    m1, s1 = find_matches(
        kpts1, kpts0, pred["warp1"], pred["certainty1"], hw1, hw0, mask1, mask0
    )
    return {
        "matches0": m0,
        "matching_scores0": s0,
        "matches1": m1,
        "matching_scores1": s1,
        "keypoints0": kpts0,
        "keypoints1": kpts1,
    }


# ---------------------------------------------------------------------------
# dense match sampling (reference roma.py:401-441 + romatch sampler)
# ---------------------------------------------------------------------------


def _multinomial_no_replacement(rng, weights: jnp.ndarray, k: int) -> jnp.ndarray:
    """Indices of k draws without replacement ∝ weights (Gumbel top-k)."""
    logw = jnp.log(jnp.maximum(weights, 1e-30))
    g = jax.random.gumbel(rng, weights.shape, dtype=jnp.float32)
    return jax.lax.top_k(logw + g, k)[1]


def kde_density(x: jnp.ndarray, std: float = 0.1) -> jnp.ndarray:
    """Gaussian KDE over match 4-vectors (romatch `kde`): density_i =
    sum_j exp(-|x_i - x_j|^2 / (2 std^2))."""
    d2 = jnp.sum((x[:, None, :] - x[None, :, :]) ** 2, axis=-1)
    return jnp.exp(-d2 / (2.0 * std * std)).sum(axis=-1)


def sample_matches(
    pred: dict,
    hw0: tuple[int, int],
    hw1: tuple[int, int],
    num: int,
    rng,
    sample_mode: str = "threshold_balanced",
    sample_thresh: float = 0.05,
    balanced_expansion: int = 4,
    kde_std: float = 0.1,
    min_density: float = 10.0,
) -> dict:
    """Sample `num` sparse matches from symmetric dense warps (batch 1).

    Static shapes: always returns exactly `num` matches; `keypoint_scores`
    carries the certainty (0 where the draw fell on certainty-0 pixels).
    """
    warp0, warp1 = pred["warp0"], pred["warp1"]
    cert0, cert1 = pred["certainty0"], pred["certainty1"]
    assert warp0.shape[0] == 1, "dense sampling is defined for batch 1"
    H0, W0 = warp0.shape[1:3]
    H1, W1 = warp1.shape[1:3]
    coords0 = get_pixel_grid(H0, W0, normalized=True)[None]
    coords1 = get_pixel_grid(H1, W1, normalized=True)[None]
    # rows: [x0_norm, y0_norm, x1_norm, y1_norm]
    m0 = jnp.concatenate([coords0, warp0], axis=-1).reshape(-1, 4)
    m1 = jnp.concatenate([warp1, coords1], axis=-1).reshape(-1, 4)
    matches = jnp.concatenate([m0, m1], axis=0)
    certainty = jnp.concatenate([cert0.reshape(-1), cert1.reshape(-1)], axis=0)

    if "threshold" in sample_mode:
        # romatch: confident-enough pixels are sampled uniformly
        certainty = jnp.where(certainty > sample_thresh, 1.0, certainty)

    rng1, rng2 = jax.random.split(rng)
    if "balanced" in sample_mode:
        k1 = min(balanced_expansion * num, matches.shape[0])
        good = _multinomial_no_replacement(rng1, certainty, k1)
        gm, gc = matches[good], certainty[good]
        density = kde_density(gm, kde_std)
        p = 1.0 / (density + 1.0)
        p = jnp.where(density < min_density, 1e-7, p)  # drop sparse regions
        # draws on zero-certainty rows are possible when fewer than k1
        # positive-weight rows exist; zero their final weight
        p = jnp.where(gc > 0, p, 1e-30)
        sel = _multinomial_no_replacement(rng2, p, min(num, k1))
        m_kpts, scores = gm[sel], gc[sel]
    else:
        sel = _multinomial_no_replacement(rng1, certainty, min(num, matches.shape[0]))
        m_kpts, scores = matches[sel], certainty[sel]

    scores = scores.reshape(1, -1)
    n = scores.shape[-1]
    return {
        "keypoints0": denormalize_coords(m_kpts[:, :2], hw0).reshape(1, n, 2),
        "keypoints1": denormalize_coords(m_kpts[:, 2:], hw1).reshape(1, n, 2),
        "matching_scores0": scores,
        "matching_scores1": scores,
        "keypoint_scores0": scores,
        "keypoint_scores1": scores,
        "keypoint_mask0": scores > 0,
        "keypoint_mask1": scores > 0,
        "matches0": jnp.arange(n, dtype=jnp.int32)[None],
        "matches1": jnp.arange(n, dtype=jnp.int32)[None],
    }


# ---------------------------------------------------------------------------
# model
# ---------------------------------------------------------------------------


class RoMa(BaseModel):
    """Dense warp matcher (reference `models/matchers/roma.py:155-441`).

    The warp source is pluggable:
      - `backend: native` (default): the in-repo RoMa network
        (`roma_net.py` — DINOv2-L + VGG19-BN + GP + anchor decoder +
        ConvRefiners), run with the reference wrapper's exact two-pass
        protocol (coarse pass at `internal_hw`, refiner-only upsample pass
        at the output size, symmetric doubled batch);
      - `warp0/certainty0` (+`warp1/certainty1`) already in the data dict
        (probabilities, e.g. via CacheLoader), or
      - `flow0/certainty_logits0` (+ optional `lr_certainty0`) raw decoder
        outputs, passed through `flow_to_warp`.
    Everything downstream (snapping, sampling, cycle error) is on-device.
    """

    default_conf = {
        "sample": False,
        "add_cycle_error": False,
        "sample_num_matches": 0,  # >0: sample dense matches, ignore keypoints
        "sample_mode": "threshold_balanced",
        "filter_threshold": 0.05,
        "max_kp_error": 2.0,
        "mutual_check": True,
        # dense-warp source: "native" runs the in-repo RoMa network
        # (roma_net.py); "data" requires warp/flow inputs (e.g. CacheLoader)
        "backend": "native",
        "net": dict(NET_DEFAULT_CONF),
        # reference-wrapper knobs (reference roma.py:161-176)
        "weights": "outdoor",
        "internal_hw": [560, 560],
        "output_hw": None,  # None = like the input images
        "upsample_preds": True,
        "symmetric": True,  # the native net always computes both directions
        "mixed_precision": True,
        "trainable": False,
    }
    required_data_keys = ["view0", "view1"]

    def setup(self):
        if self.conf.backend == "native":
            self.net = RoMaNet(conf=self.conf.net)

    # -- native dense-warp path (reference estimate_warp_symmetric,
    # roma.py:323-361, with the romatch network replaced by roma_net) -------

    def _prep(self, image: jnp.ndarray, hw) -> jnp.ndarray:
        """[0,1] NHWC -> ImageNet-normalized RGB at `hw` (reference
        process_image, roma.py:249-265: bilinear align_corners=False)."""
        if image.shape[-1] == 1:
            image = jnp.tile(image, (1, 1, 1, 3))
        if hw is not None and tuple(image.shape[1:3]) != tuple(hw):
            image = jax.image.resize(
                image, (image.shape[0], int(hw[0]), int(hw[1]), 3), method="linear"
            )
        mean = jnp.asarray([0.485, 0.456, 0.406], image.dtype)
        std = jnp.asarray([0.229, 0.224, 0.225], image.dtype)
        return (image - mean) / std

    def _dense_warp_native(self, data: dict) -> dict:
        c = self.conf
        img0, img1 = data["view0"]["image"], data["view1"]["image"]
        B = img0.shape[0]
        internal = tuple(int(v) for v in c.internal_hw)
        im0 = self._prep(img0, internal)
        im1 = self._prep(img1, internal)
        if c.mixed_precision:
            im0, im1 = im0.astype(jnp.bfloat16), im1.astype(jnp.bfloat16)
        corresps = self.net(im0, im1)
        lr_certainty = corresps[16]["certainty"].astype(jnp.float32)
        flow = corresps[1]["flow"].astype(jnp.float32)
        certainty = corresps[1]["certainty"].astype(jnp.float32)
        if c.upsample_preds:
            # second, refiner-only pass at the output resolution
            # (reference upsample_flow_siamese, roma.py:267-321)
            hw0 = tuple(c.output_hw) if c.output_hw else tuple(img0.shape[1:3])
            hw1 = tuple(c.output_hw) if c.output_hw else tuple(img1.shape[1:3])
            assert hw0 == hw1, "native RoMa upsample needs equal view sizes"
            imq = self._prep(img0, hw0)
            ims = self._prep(img1, hw1)
            if c.mixed_precision:
                imq, ims = imq.astype(jnp.bfloat16), ims.astype(jnp.bfloat16)
            sf = float(
                (hw0[0] * hw0[1] / (internal[0] * internal[1])) ** 0.5
            )
            corresps = self.net(
                imq,
                ims,
                flow=flow,
                certainty=certainty,
                upsample=True,
                scale_factor=sf,
            )
            flow = corresps[1]["flow"].astype(jnp.float32)
            certainty = corresps[1]["certainty"].astype(jnp.float32)
        out_q = flow_to_warp(flow[:B], certainty[:B], lr_certainty[:B])
        out_s = flow_to_warp(flow[B:], certainty[B:], lr_certainty[B:])
        return {
            "warp0": out_q["warp"],
            "certainty0": out_q["certainty"],
            "warp1": out_s["warp"],
            "certainty1": out_s["certainty"],
        }

    def _hw(self, view):
        if "image" in view:
            return tuple(view["image"].shape[1:3])
        size = view["image_size"]
        return (int(size[0, 1]), int(size[0, 0]))

    def _forward(self, data: dict, train: bool = False) -> dict:
        c = self.conf
        pred = {}
        for v in ("0", "1"):
            if f"warp{v}" in data:
                pred[f"warp{v}"] = data[f"warp{v}"]
                pred[f"certainty{v}"] = data[f"certainty{v}"]
            elif f"flow{v}" in data:
                out = flow_to_warp(
                    data[f"flow{v}"],
                    data[f"certainty_logits{v}"],
                    data.get(f"lr_certainty{v}"),
                )
                pred[f"warp{v}"] = out["warp"]
                pred[f"certainty{v}"] = out["certainty"]
            elif c.backend == "native":
                # computes both directions at once; when the data already
                # supplied one direction, only fill the missing keys so the
                # provided warp/certainty are not overwritten
                native = self._dense_warp_native(data)
                pred.update({k: x for k, x in native.items() if k not in pred})
                break
            else:
                raise NotImplementedError(
                    "RoMa needs a dense warp source: provide warp{0,1}/"
                    "certainty{0,1} or flow{0,1}/certainty_logits{0,1} in the "
                    "data, or set backend: native."
                )
        if c.add_cycle_error:
            pred["cycle_error0"] = cycle_dist(pred["warp0"], pred["warp1"])
            pred["cycle_error1"] = cycle_dist(pred["warp1"], pred["warp0"])
        if c.sample_num_matches > 0:
            rng = self.make_rng("sample")
            pred.update(
                sample_matches(
                    pred,
                    self._hw(data["view0"]),
                    self._hw(data["view1"]),
                    int(c.sample_num_matches),
                    rng,
                    sample_mode=c.sample_mode,
                    sample_thresh=c.filter_threshold,
                )
            )
        elif "keypoints0" in data:
            pred.update(
                match_keypoints_dense(
                    pred, data, c.max_kp_error, c.filter_threshold, c.mutual_check
                )
            )
        return pred

    def loss(self, pred, data, train: bool = False):
        raise NotImplementedError("RoMa is eval-only (reference roma.py:443)")
