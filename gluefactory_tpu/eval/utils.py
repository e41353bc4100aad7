"""Per-pair evaluation metrics (role of reference `eval/utils.py:41-337`).

These run in the eval pipeline's loop 2 over cached predictions, per item on
the host — pure numpy for latency (eager device ops would round-trip the TPU
tunnel per pair). The batched XLA RANSAC estimators are used through the
estimator registry.
"""

from __future__ import annotations

import numpy as np

from ..geometry.wrappers import Camera, Pose
from ..robust_estimators import load_estimator
from ..utils.tools import AUCMetric


# ---------------------------------------------------------------------------
# numpy geometry helpers (host-side mirrors of geometry/*.py)
# ---------------------------------------------------------------------------


def warp_points_np(points: np.ndarray, H: np.ndarray, inverse: bool = False) -> np.ndarray:
    H = np.linalg.inv(H) if inverse else H
    pts_h = np.concatenate([points, np.ones_like(points[..., :1])], axis=-1)
    warped = pts_h @ H.T
    return warped[..., :2] / (warped[..., 2:] + 1e-12)


def sym_homography_error_np(kpts0, kpts1, H) -> np.ndarray:
    d01 = np.linalg.norm(warp_points_np(kpts0, H) - kpts1, axis=-1)
    d10 = np.linalg.norm(warp_points_np(kpts1, H, inverse=True) - kpts0, axis=-1)
    return 0.5 * (d01 + d10)


def sym_epipolar_distance_np(p0, p1, E, squared=True) -> np.ndarray:
    """Reference `epipolar.py:32-56` exactly: the non-squared form is the
    MEAN of the two point-to-epipolar-line distances, not the sqrt of the
    squared (Sampson-like) form."""
    p0h = np.concatenate([p0, np.ones_like(p0[..., :1])], -1)
    p1h = np.concatenate([p1, np.ones_like(p1[..., :1])], -1)
    Ep0 = p0h @ E.T
    Etp1 = p1h @ E
    p1Ep0 = np.sum(p1h * Ep0, -1)
    d0 = np.maximum(Ep0[..., 0] ** 2 + Ep0[..., 1] ** 2, 1e-6)
    d1 = np.maximum(Etp1[..., 0] ** 2 + Etp1[..., 1] ** 2, 1e-6)
    if squared:
        return p1Ep0**2 * (1.0 / d0 + 1.0 / d1)
    return np.abs(p1Ep0) * (1.0 / np.sqrt(d0) + 1.0 / np.sqrt(d1)) / 2.0


def pose_to_E(T: Pose) -> np.ndarray:
    R = np.asarray(T.R)
    t = np.asarray(T.t)
    tx = np.array(
        [[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]], dtype=np.float64
    )
    return tx @ R


def angle_error_mat_np(R1, R2):
    cos = np.clip((np.trace(R1.T @ R2) - 1) / 2, -1.0, 1.0)
    return np.rad2deg(np.abs(np.arccos(cos)))


def angle_error_vec_np(v1, v2):
    n = np.linalg.norm(v1) * np.linalg.norm(v2)
    err = np.rad2deg(np.arccos(np.clip(np.dot(v1, v2) / (n + 1e-15), -1.0, 1.0)))
    return min(err, 180.0 - err)


def relative_pose_error_np(T_0to1: Pose, R, t):
    R_gt, t_gt = np.asarray(T_0to1.R), np.asarray(T_0to1.t)
    return angle_error_mat_np(np.asarray(R), R_gt), angle_error_vec_np(np.asarray(t), t_gt)


# ---------------------------------------------------------------------------
# matches extraction
# ---------------------------------------------------------------------------


def get_matches_scores(kpts0, kpts1, matches0, mscores0):
    """Select matched keypoint pairs (unbatched numpy arrays)."""
    matches0 = np.asarray(matches0)
    valid = matches0 > -1
    m_kpts0 = np.asarray(kpts0)[valid]
    m_kpts1 = np.asarray(kpts1)[matches0[valid]]
    scores = np.asarray(mscores0)[valid]
    return m_kpts0, m_kpts1, scores


def eval_per_batch_item(data, pred, eval_f, *args, **kwargs):
    results = [
        eval_f(data_i, pred_i, *args, **kwargs)
        for data_i, pred_i in zip(data, pred)
    ]
    return {k: [r[k] for r in results] for k in results[0].keys()}


# ---------------------------------------------------------------------------
# metric functions (each: data_i, pred_i unbatched -> dict of scalars)
# ---------------------------------------------------------------------------


def eval_matches_homography(data: dict, pred: dict) -> dict:
    """(reference `eval/utils.py:137-156`)"""
    H_gt = np.asarray(data["H_0to1"])
    kpts0, kpts1 = pred["keypoints0"], pred["keypoints1"]
    m0, scores0 = pred["matches0"], pred["matching_scores0"]
    pts0, pts1, scores = get_matches_scores(kpts0, kpts1, m0, scores0)
    err = sym_homography_error_np(pts0, pts1, H_gt)
    # empty-match precision is 0.0 (reference nan_to_num, eval/utils.py:150-151)
    results = {
        "prec@1px": float(np.nan_to_num((err < 1).mean() if err.size else np.nan)),
        "prec@3px": float(np.nan_to_num((err < 3).mean() if err.size else np.nan)),
        "num_matches": int(pts0.shape[0]),
        "num_keypoints": float(np.asarray(pred.get("keypoint_mask0", np.ones(len(kpts0), bool))).sum() + np.asarray(pred.get("keypoint_mask1", np.ones(len(kpts1), bool))).sum()) / 2.0,
    }
    return results


def eval_matches_epipolar(data: dict, pred: dict) -> dict:
    """(reference `eval/utils.py:41-70`)"""
    T_0to1: Pose = data["T_0to1"]
    camera0: Camera = data["view0"]["camera"]
    camera1: Camera = data["view1"]["camera"]
    kpts0, kpts1 = pred["keypoints0"], pred["keypoints1"]
    m0, scores0 = pred["matches0"], pred["matching_scores0"]
    pts0, pts1, scores = get_matches_scores(kpts0, kpts1, m0, scores0)
    p0 = np.asarray(camera0.normalize(np.asarray(pts0)[None]))[0]
    p1 = np.asarray(camera1.normalize(np.asarray(pts1)[None]))[0]
    E = pose_to_E(T_0to1)
    epi_err = sym_epipolar_distance_np(p0, p1, E, squared=False)
    # empty-match precision is 0.0 (reference nan_to_num, eval/utils.py:63-65)
    results = {
        "epi_prec@1e-4": float(np.nan_to_num((epi_err < 1e-4).mean() if epi_err.size else np.nan)),
        "epi_prec@5e-4": float(np.nan_to_num((epi_err < 5e-4).mean() if epi_err.size else np.nan)),
        "epi_prec@1e-3": float(np.nan_to_num((epi_err < 1e-3).mean() if epi_err.size else np.nan)),
        "num_matches": int(pts0.shape[0]),
        "num_keypoints": (len(np.asarray(kpts0)) + len(np.asarray(kpts1))) / 2.0,
    }
    return results


def eval_matches_depth(data: dict, pred: dict) -> dict:
    """Reprojection precision via GT depth + GT recall/precision
    (reference `eval/utils.py:73-134`).

    Runs its jnp helpers pinned to the CPU backend: loop 2 is a host-side
    per-pair metrics loop with ragged shapes — eager dispatches to the
    (relayed, single-owner) TPU would cost seconds each (CLAUDE.md)."""
    import jax
    import jax.numpy as jnp

    from ..geometry.depth import symmetric_reprojection_error

    cpu = jax.devices("cpu")[0]

    camera0: Camera = data["view0"]["camera"]
    camera1: Camera = data["view1"]["camera"]
    T_0to1: Pose = data["T_0to1"]
    depth0 = np.asarray(data["view0"]["depth"])
    depth1 = np.asarray(data["view1"]["depth"])
    kpts0, kpts1 = pred["keypoints0"], pred["keypoints1"]
    m0, scores0 = pred["matches0"], pred["matching_scores0"]
    pts0, pts1, scores = get_matches_scores(kpts0, kpts1, m0, scores0)
    results: dict = {"num_matches": int(pts0.shape[0])}
    if pts0.shape[0] == 0:
        # reference semantics: empty selections give 0-precision
        # (nan_to_num) and zero covisible count (eval/utils.py:103-108)
        results.update(
            {
                "reproj_prec@1px": 0.0,
                "reproj_prec@3px": 0.0,
                "reproj_prec@5px": 0.0,
                "covisible": 0.0,
                "covisible_percent": 0.0,
            }
        )
    else:
        with jax.default_device(cpu):
            err, valid = symmetric_reprojection_error(
                jnp.asarray(pts0[None], jnp.float32),
                jnp.asarray(pts1[None], jnp.float32),
                camera0, camera1, T_0to1,
                jnp.asarray(depth0[None]), jnp.asarray(depth1[None]),
            )
        err = np.asarray(err)[0]
        valid = np.asarray(valid)[0]
        # invalid-depth entries count as inf error when selected; precision
        # is over VALID (covisible) matches only (reference :102-108)
        sel = np.nan_to_num(err[valid], nan=np.inf)
        results.update(
            {
                "reproj_prec@1px": float(np.nan_to_num((sel < 1).mean() if sel.size else np.nan)),
                "reproj_prec@3px": float(np.nan_to_num((sel < 3).mean() if sel.size else np.nan)),
                "reproj_prec@5px": float(np.nan_to_num((sel < 5).mean() if sel.size else np.nan)),
                "covisible": float(valid.sum()),
                "covisible_percent": float(valid.mean()) * 100.0,
            }
        )

    # GT-based recall/precision at 3px (reference :110-133): GT matches from
    # pose+depth over the FULL keypoint sets, thresholds (3, 5)
    from ..geometry.gt_generation import gt_matches_from_pose_depth

    with jax.default_device(cpu):
        kp0 = jnp.asarray(np.asarray(kpts0)[None], jnp.float32)
        kp1 = jnp.asarray(np.asarray(kpts1)[None], jnp.float32)
        gt = gt_matches_from_pose_depth(
            kp0, kp1, camera0, camera1, T_0to1,
            jnp.asarray(depth0[None]), jnp.asarray(depth1[None]),
            pos_th=3.0, neg_th=5.0,
        )
    gt_m = np.asarray(gt["matches0"])[0]
    m = np.asarray(m0)
    pos = (gt_m > -1).astype(np.float64)
    results["gt_match_recall@3px"] = float(
        ((m == gt_m) * pos).sum() / (1e-8 + pos.sum())
    )
    pmask = ((m > -1) & (gt_m >= -1)).astype(np.float64)
    results["gt_match_precision@3px"] = float(
        ((m == gt_m) * pmask).sum() / (1e-8 + pmask.sum())
    )
    return results


def eval_relative_pose_robust(data: dict, pred: dict, conf) -> dict:
    """(reference `eval/utils.py:159-194`)"""
    T_0to1: Pose = data["T_0to1"]
    camera0 = data["view0"]["camera"]
    camera1 = data["view1"]["camera"]
    kpts0, kpts1 = pred["keypoints0"], pred["keypoints1"]
    m0, scores0 = pred["matches0"], pred["matching_scores0"]
    pts0, pts1, scores = get_matches_scores(kpts0, kpts1, m0, scores0)

    estimator = load_estimator("relative_pose", conf["estimator"])(conf)
    est = estimator(
        {"m_kpts0": pts0, "m_kpts1": pts1, "camera0": camera0, "camera1": camera1}
    )
    if not est["success"]:
        return {"rel_pose_error": np.inf, "ransac_inl": 0, "ransac_inl%": 0.0}
    M = est["M_0to1"]
    inl = np.asarray(est["inliers"])
    r_err, t_err = relative_pose_error_np(T_0to1, M.R, M.t)
    return {
        "rel_pose_error": float(max(r_err, t_err)),
        "ransac_inl": int(inl.sum()),
        "ransac_inl%": float(inl.mean()) if inl.size else 0.0,
    }


def eval_homography_robust(data: dict, pred: dict, conf) -> dict:
    """(reference `eval/utils.py:197-238`)"""
    H_gt = np.asarray(data["H_0to1"])
    kpts0, kpts1 = pred["keypoints0"], pred["keypoints1"]
    m0, scores0 = pred["matches0"], pred["matching_scores0"]
    pts0, pts1, scores = get_matches_scores(kpts0, kpts1, m0, scores0)
    est_data = {"m_kpts0": pts0, "m_kpts1": pts1}
    if "line_matches0" in pred:
        lm0 = np.asarray(pred["line_matches0"])
        lvalid = lm0 > -1
        est_data["m_lines0"] = np.asarray(pred["lines0"])[lvalid]
        est_data["m_lines1"] = np.asarray(pred["lines1"])[lm0[lvalid]]
    estimator = load_estimator("homography", conf["estimator"])(conf)
    est = estimator(est_data)
    if not est["success"]:
        return {"H_error_ransac": np.inf, "ransac_inl": 0, "ransac_inl%": 0.0}
    M = np.asarray(est["M_0to1"])
    inl = np.asarray(est["inliers"])
    size = np.asarray(data["view0"]["image_size"])
    err = homography_corner_error_np(M, H_gt, size)
    return {
        "H_error_ransac": float(err),
        "ransac_inl": int(inl.sum()),
        "ransac_inl%": float(inl.mean()) if inl.size else 0.0,
    }


def homography_corner_error_np(H, H_gt, image_size) -> float:
    w, h = float(image_size[0]), float(image_size[1])
    corners = np.array([[0, 0], [w, 0], [w, h], [0, h]], np.float64)
    d = np.linalg.norm(
        warp_points_np(corners, np.asarray(H, np.float64))
        - warp_points_np(corners, np.asarray(H_gt, np.float64)),
        axis=-1,
    )
    return float(d.mean())


def eval_homography_dlt(data: dict, pred: dict) -> dict:
    """Weighted DLT homography from all matches (reference
    `eval/utils.py:241-261`, which uses kornia's weighted DLT)."""
    import jax.numpy as jnp

    from ..geometry.homography import compute_homography_dlt

    H_gt = np.asarray(data["H_0to1"])
    kpts0, kpts1 = pred["keypoints0"], pred["keypoints1"]
    m0, scores0 = pred["matches0"], pred["matching_scores0"]
    pts0, pts1, scores = get_matches_scores(kpts0, kpts1, m0, scores0)
    error = np.nan
    if pts0.shape[0] >= 4 and scores.sum() > 0:
        import jax

        with jax.default_device(jax.devices("cpu")[0]):
            H = compute_homography_dlt(
                jnp.asarray(pts0[None], jnp.float32),
                jnp.asarray(pts1[None], jnp.float32),
                jnp.asarray(scores[None], jnp.float32),
            )
        H = np.asarray(H)[0]
        if np.isfinite(H).all():
            size = np.asarray(data["view0"]["image_size"])
            error = homography_corner_error_np(H, H_gt, size)
    return {"H_error_dlt": float(error)}


IGNORE_FEATURE = -2


def get_tp_fp_pts(pred_matches, gt_matches, pred_scores):
    """TP/FP/scores/num positives for a set of matches (reference
    `eval/utils.py:292-310`)."""
    pred_matches = np.asarray(pred_matches)
    gt_matches = np.asarray(gt_matches)
    pred_scores = np.asarray(pred_scores)
    ignore_mask = gt_matches != IGNORE_FEATURE
    pred_matches, gt_matches, pred_scores = (
        pred_matches[ignore_mask],
        gt_matches[ignore_mask],
        pred_scores[ignore_mask],
    )
    num_pos = int(np.sum(gt_matches != -1))
    pred_positives = pred_matches != -1
    tp = pred_matches[pred_positives] == gt_matches[pred_positives]
    fp = pred_matches[pred_positives] != gt_matches[pred_positives]
    scores = pred_scores[pred_positives]
    return tp, fp, scores, num_pos


def AP(tp, fp):
    """11-free interpolated average precision (reference `eval/utils.py:313-323`)."""
    recall = tp
    precision = tp / np.maximum(tp + fp, 1e-9)
    recall = np.concatenate(([0.0], recall, [1.0]))
    precision = np.concatenate(([0.0], precision, [0.0]))
    for i in range(precision.size - 1, 0, -1):
        precision[i - 1] = max(precision[i - 1], precision[i])
    i = np.where(recall[1:] != recall[:-1])[0]
    return float(np.sum((recall[i + 1] - recall[i]) * precision[i + 1]))


def aggregate_pr_results(results: dict, suffix: str = "") -> dict:
    """Aggregate per-pair TP/FP lists into PR curves + AP
    (reference `eval/utils.py:326-337`)."""
    tp_list = np.concatenate(results["tp" + suffix], axis=0)
    fp_list = np.concatenate(results["fp" + suffix], axis=0)
    scores_list = np.concatenate(results["scores" + suffix], axis=0)
    n_gt = max(results["num_pos" + suffix], 1)

    out = {}
    idx = np.argsort(scores_list)[::-1]
    tp_vals = np.cumsum(tp_list[idx]) / n_gt
    fp_vals = np.cumsum(fp_list[idx]) / n_gt
    out["curve_recall" + suffix] = tp_vals
    out["curve_precision" + suffix] = tp_vals / np.maximum(tp_vals + fp_vals, 1e-9)
    out["AP" + suffix] = AP(tp_vals, fp_vals) * 100
    return out


def eval_poses(pose_results: dict, auc_ths: list, key: str, unit: str = "°") -> dict:
    """Select the best RANSAC threshold by mAA and compute pose AUCs
    (reference `eval/utils.py:264-289`).

    pose_results: {th: {key: [per-pair errors], ...}}."""
    pose_aucs = {}
    best_th = -1
    for th, results_i in pose_results.items():
        pose_aucs[th] = AUCMetric(auc_ths, results_i[key]).compute()
    mAAs = {k: np.mean(v) for k, v in pose_aucs.items()}
    best_th = max(mAAs, key=mAAs.get)

    if len(pose_results) > 1:
        print("Tested ransac setup with following results:")
        for k, v in mAAs.items():
            print(f"AUC {k}: {v}")
        print(f"Best threshold: {best_th}")

    summaries = {}
    for i, ath in enumerate(auc_ths):
        summaries[f"{key}@{ath}{unit}"] = pose_aucs[best_th][i]
    summaries[f"{key}_mAA"] = mAAs[best_th]
    for k, v in pose_results[best_th].items():
        arr = np.asarray(v, dtype=np.float64)
        if arr.ndim == 1:
            # reference: round(np.median(arr), 3) (eval/utils.py:286-289)
            summaries[f"m{k}"] = float(round(np.median(arr), 3))
    return summaries, best_th
