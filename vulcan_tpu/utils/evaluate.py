"""Trajectory evaluation: ATE RMSE via Horn alignment.

Reimplementation of the standard TUM RGB-D benchmark ``evaluate_ate``
algorithm (SURVEY.md §5: Horn closed-form similarity alignment + RMSE), the
parity metric named in BASELINE.json.  No network access, so this local
implementation replaces the TUM scripts; it follows the published method:
align estimated to ground-truth positions with the closed-form SE(3) (Horn
1987, SVD variant), then RMSE of residual translations.
"""
from __future__ import annotations

import numpy as np


def horn_align(est: np.ndarray, gt: np.ndarray):
    """Closed-form rigid alignment est->gt for (N,3) point sets.

    Returns (R, t) minimizing ||R @ est + t - gt||^2 (no scale, matching
    the TUM ATE default).
    """
    est = np.asarray(est, np.float64)
    gt = np.asarray(gt, np.float64)
    mu_e = est.mean(axis=0)
    mu_g = gt.mean(axis=0)
    E = est - mu_e
    G = gt - mu_g
    H = E.T @ G
    U, _, Vt = np.linalg.svd(H)
    S = np.eye(3)
    if np.linalg.det(U @ Vt) < 0:
        S[2, 2] = -1.0
    R = Vt.T @ S @ U.T
    t = mu_g - R @ mu_e
    return R, t


def ate_rmse(est_positions, gt_positions) -> float:
    """Absolute trajectory error RMSE after Horn alignment (meters)."""
    est = np.asarray(est_positions, np.float64)
    gt = np.asarray(gt_positions, np.float64)
    assert est.shape == gt.shape and est.shape[1] == 3
    R, t = horn_align(est, gt)
    aligned = est @ R.T + t
    err = np.linalg.norm(aligned - gt, axis=1)
    return float(np.sqrt(np.mean(err**2)))


def associate_timestamps(
    ts_a: np.ndarray, ts_b: np.ndarray, max_dt: float = 0.02
):
    """Greedy nearest-timestamp association (TUM associate.py algorithm).

    Returns list of (i, j) index pairs with |ts_a[i]-ts_b[j]| <= max_dt,
    each index used at most once, best matches first.
    """
    pairs = []
    for i, ta in enumerate(ts_a):
        j = int(np.argmin(np.abs(ts_b - ta)))
        dt = abs(float(ts_b[j] - ta))
        if dt <= max_dt:
            pairs.append((dt, i, j))
    pairs.sort()
    used_a, used_b, out = set(), set(), []
    for _, i, j in pairs:
        if i in used_a or j in used_b:
            continue
        used_a.add(i)
        used_b.add(j)
        out.append((i, j))
    out.sort()
    return out
