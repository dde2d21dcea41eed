"""EER computation.

``eer_reference``: byte-exact reimplementation of the reference's
threshold-sweep semantics (``scripts/train.py:135-149`` + ``utils.py:5-16``):
200 thresholds in arange(-1, 1, 0.01); FRR = % of client scores < th and
FAR = % of impostor scores >= th, each rounded to 4 decimals; EER is the mean
of FAR/FRR at the first sign change of FAR-FRR (rounded to 4), else 50.0.
Vectorized — the reference loops a Python ``Score`` per threshold per trial.

``eer_exact``: the standard ROC-based EER (interpolated crossing), reported
alongside as the better-behaved metric.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np


def far_frr(scores: np.ndarray, thresholds: np.ndarray):
    """Vectorized (FAR%, FRR%)-style rates for a score set at thresholds.
    Returns (frac_below, frac_at_or_above) * 100 without rounding."""
    s = np.sort(np.asarray(scores, dtype=np.float64))
    n = len(s)
    below = np.searchsorted(s, thresholds, side="left")  # scores < th
    frr = below * 100.0 / n
    far = (n - below) * 100.0 / n
    return far, frr


def eer_reference(client_scores: Sequence[float], impostor_scores: Sequence[float]) -> float:
    thresholds = np.arange(-1, 1, 0.01)
    far_c, frr_c = far_frr(np.asarray(client_scores), thresholds)
    far_i, _ = far_frr(np.asarray(impostor_scores), thresholds)
    frr = np.round(frr_c, 4)          # Score(CL, th, 'FRR'), utils.py:5-16
    far = np.round(far_i, 4)          # Score(IM, th, 'FAR')
    diff = np.sign(far - frr)
    idx = np.argwhere(np.diff(diff) != 0).reshape(-1)
    if len(idx) > 0:
        i = int(idx[0])
        return round((far[i] + frr[i]) / 2, 4)
    return 50.00


def eer_exact(client_scores: Sequence[float], impostor_scores: Sequence[float]) -> float:
    """ROC EER with linear interpolation at the FAR==FRR crossing (in %)."""
    clients = np.asarray(client_scores, dtype=np.float64)
    impostors = np.asarray(impostor_scores, dtype=np.float64)
    all_scores = np.concatenate([clients, impostors])
    thresholds = np.unique(all_scores)
    far, _ = far_frr(impostors, thresholds)
    _, frr = far_frr(clients, thresholds)
    d = far - frr
    cross = np.where(d <= 0)[0]
    if len(cross) == 0:
        return 50.0
    i = cross[0]
    if i == 0 or d[i] == 0:
        return float((far[i] + frr[i]) / 2)
    # interpolate between threshold i-1 and i
    t = d[i - 1] / (d[i - 1] - d[i])
    far_x = far[i - 1] + t * (far[i] - far[i - 1])
    frr_x = frr[i - 1] + t * (frr[i] - frr[i - 1])
    return float((far_x + frr_x) / 2)


def min_dcf(
    client_scores: Sequence[float],
    impostor_scores: Sequence[float],
    p_target: float = 0.01,
    c_miss: float = 1.0,
    c_fa: float = 1.0,
) -> float:
    """Minimum normalized detection cost (NIST SRE convention; the standard
    companion metric to EER in speaker verification, not present in the
    reference). Sweeps all distinct score thresholds."""
    clients = np.asarray(client_scores, dtype=np.float64)
    impostors = np.asarray(impostor_scores, dtype=np.float64)
    scores = np.concatenate([clients, impostors])
    # include a reject-everything endpoint so minDCF is bounded by 1.0
    thresholds = np.unique(np.concatenate([scores, [scores.max() + 1.0]]))
    far, _ = far_frr(impostors, thresholds)
    _, frr = far_frr(clients, thresholds)
    p_miss = frr / 100.0
    p_fa = far / 100.0
    dcf = c_miss * p_miss * p_target + c_fa * p_fa * (1.0 - p_target)
    dcf_norm = dcf / min(c_miss * p_target, c_fa * (1.0 - p_target))
    return float(np.min(dcf_norm))


def cosine_scores(emb1: np.ndarray, emb2: np.ndarray, eps: float = 1e-8) -> np.ndarray:
    """Batched cosine similarity, torch ``F.cosine_similarity`` semantics
    (``utils.py:18-21``): denominators clamped at eps per vector."""
    n1 = np.maximum(np.linalg.norm(emb1, axis=-1), eps)
    n2 = np.maximum(np.linalg.norm(emb2, axis=-1), eps)
    return np.sum(emb1 * emb2, axis=-1) / (n1 * n2)
