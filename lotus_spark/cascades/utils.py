"""Cascade statistics: importance sampling + threshold learning.

Re-implements (from the published description, SURVEY §4.2; reference
``lotus/sem_ops/cascade_utils.py``) the accuracy-guaranteed approximation
machinery:

- proxy scores calibrated by quantile bucketing (``cascade_utils.py:33-39``)
- importance sampling ∝ √score with defensive uniform mixing (``:8-30``)
- threshold search with Hoeffding-style upper/lower-bound corrections so the
  (τ⁺, τ⁻) pair meets ``recall_target``/``precision_target`` at failure
  probability ``delta`` (``:42-144``)

Rows scoring ≥ τ⁺ are accepted by the proxy, ≤ τ⁻ rejected, and the gray
zone routed to the oracle LM. All math is NumPy on a *sampled* slice — the
only driver materialization in the cascade path.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np


@dataclass
class CascadeArgs:
    """Defaults mirror the reference (``lotus/types.py:163-182``)."""

    recall_target: float = 0.8
    precision_target: float = 0.8
    sampling_percentage: float = 0.1
    failure_probability: float = 0.2
    min_sample_size: int = 20
    max_sample_size: int = 2000
    # joins only:
    min_join_cascade_size: int = 100
    cascade_IS_weight: float = 0.5
    cascade_num_calibration_quantiles: int = 50
    # pre-warmed thresholds in calibrated [0,1] space (CascadePrewarmOptimizer
    # pins these; when set, execution skips sampling + oracle labeling)
    tau_pos: Optional[float] = None
    tau_neg: Optional[float] = None
    # join-cascade plan: 'search_filter' | 'map_search_filter' | None
    # (None = learn both, run the one with the smaller gray zone)
    join_cascade_strategy: Optional[str] = None


def calibrate_scores(scores: np.ndarray, n_quantiles: int = 50) -> np.ndarray:
    """Quantile-bucket calibration: map raw proxy scores to their empirical
    quantile rank in [0, 1] (robust to uncalibrated logprobs)."""
    if len(scores) == 0:
        return scores.astype(float)
    order = np.argsort(np.argsort(scores, kind="stable"), kind="stable")
    ranks = (order + 1) / len(scores)
    return np.ceil(ranks * n_quantiles) / n_quantiles


def importance_sampling(
    scores: np.ndarray,
    sample_percentage: float,
    weight: float = 0.5,
    seed: int = 42,
    min_sample: int = 20,
    max_sample: int = 2000,
) -> tuple[np.ndarray, np.ndarray]:
    """Sample indices with probability ∝ √score defensively mixed with
    uniform; returns (indices, correction_weights). Correction weight
    1/(m·p_i) makes Σ x·w an (approximately, sampling is without
    replacement) unbiased estimate of the population total; the threshold
    learner only uses weighted *ratios*, where the scale cancels exactly."""
    n = len(scores)
    sqrt_s = np.sqrt(np.clip(scores, 0.0, None))
    total = sqrt_s.sum()
    prop = sqrt_s / total if total > 0 else np.full(n, 1.0 / n)
    probs = weight * prop + (1.0 - weight) / n
    probs = probs / probs.sum()
    size = int(np.clip(round(n * sample_percentage), min(min_sample, n), min(max_sample, n)))
    rng = np.random.default_rng(seed)
    idx = rng.choice(n, size=size, replace=False, p=probs)
    correction = 1.0 / (size * probs[idx])
    return idx, correction


def _hoeffding_eps(n: int, delta: float) -> float:
    """One-sided Hoeffding deviation bound for a mean of n [0,1] samples."""
    if n <= 0:
        return 1.0
    return float(np.sqrt(np.log(1.0 / delta) / (2.0 * n)))


def learn_filter_thresholds(
    sample_scores: np.ndarray,
    oracle_labels: np.ndarray,
    correction_weights: np.ndarray,
    recall_target: float,
    precision_target: float,
    delta: float,
) -> tuple[float, float]:
    """Learn (tau_pos, tau_neg) on an oracle-labeled sample.

    tau_pos: smallest threshold such that the Hoeffding-corrected lower bound
    on precision of {score ≥ tau_pos} meets precision_target.
    tau_neg: largest threshold such that the corrected lower bound on recall
    of {score > tau_neg} meets recall_target.
    Falls back to (2.0, 0.0) — accept nothing / reject nothing, i.e.
    oracle-for-everything — when no threshold satisfies the bound.
    """
    scores = np.asarray(sample_scores, dtype=float)
    labels = np.asarray(oracle_labels, dtype=bool)
    w = np.asarray(correction_weights, dtype=float)
    # split the failure budget between the two bounds
    eps = _hoeffding_eps(len(scores), delta / 2.0)

    candidates = np.unique(scores)
    total_pos = float((w * labels).sum())

    tau_pos = 2.0
    for t in candidates:
        mask = scores >= t
        denom = float((w * mask).sum())
        if denom <= 0:
            continue
        precision = float((w * (mask & labels)).sum()) / denom
        if precision - eps >= precision_target:
            tau_pos = float(t)
            break  # smallest t achieving the bound (candidates ascend)

    tau_neg = 0.0
    if total_pos > 0:
        for t in candidates[::-1]:
            mask = scores > t
            recall = float((w * (mask & labels)).sum()) / total_pos
            if recall - eps >= recall_target:
                tau_neg = float(t)
                break  # largest t achieving the bound
    if tau_neg > tau_pos:
        tau_neg = tau_pos
    return tau_pos, tau_neg
