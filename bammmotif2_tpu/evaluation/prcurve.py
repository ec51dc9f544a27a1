"""Precision/recall threshold sweep and ranking metrics.

Parity: ``FDR::calculatePR`` (SURVEY.md 2.9): pool positive and negative
scores, sweep thresholds over the sorted pool; at threshold t,
TP = #pos >= t, FP = (#neg >= t) / mFold (negatives are an mFold-times
oversample), precision = TP / (TP + FP), recall = TP / #pos.  Also provides
the average-recall (AvRec) summary used by the companion papers as the
single-number motif quality metric.
"""

from __future__ import annotations

import numpy as np

from bammmotif2_tpu.scoring.scan import empirical_pvalues


def threshold_sweep(pos: np.ndarray, neg: np.ndarray, m_fold: float) -> dict:
    """Sweep thresholds over pooled descending scores.

    ``m_fold``: the negative oversampling factor FP counts are divided by
    so precision/recall refer to the positive-set scale — the --mFold
    integer for sampled negatives, or #neg/#pos (possibly < 1) for
    user-provided negative sets.

    Returns dict of arrays (one entry per pooled score, descending):
    score, tp, fp (mFold-normalized), precision, recall, pvalue.
    """
    pos = np.asarray(pos, np.float64)
    neg = np.asarray(neg, np.float64)
    pool = np.concatenate([pos, neg])
    is_pos = np.concatenate([np.ones(pos.size, bool), np.zeros(neg.size, bool)])
    order = np.argsort(-pool, kind="stable")
    pool, is_pos = pool[order], is_pos[order]
    tp = np.cumsum(is_pos).astype(np.float64)
    fp = np.cumsum(~is_pos).astype(np.float64) / (m_fold if m_fold > 0 else 1)
    precision = tp / np.maximum(tp + fp, 1e-30)
    recall = tp / max(pos.size, 1)
    pvalue = empirical_pvalues(pool, neg)
    return {
        "score": pool,
        "tp": tp,
        "fp": fp,
        "precision": precision,
        "recall": recall,
        "pvalue": pvalue,
    }


def average_recall(sweep: dict, fdr_range: tuple = (0.0, 0.5)) -> float:
    """AvRec: mean recall over a false-discovery-rate range (default 0..0.5),
    the quality headline of Ge et al. 2021.  Computed by integrating recall
    as a function of FDR = 1 - precision over the sweep.

    O(n log n): sort by FDR once and take the running-max recall, then
    read the 101 grid points by searchsorted.  (The previous 101 x n
    broadcast allocated ~2 GB per call on MOPS sweeps of genome-scale
    sets — 23M pooled window scores at 10k x 200 bp x mFold 10.)"""
    fdr = 1.0 - sweep["precision"]
    recall = sweep["recall"]
    lo, hi = fdr_range
    order = np.argsort(fdr, kind="stable")
    f_sorted = fdr[order]
    r_best = np.maximum.accumulate(recall[order])  # best recall at FDR <= f
    grid = np.linspace(lo, hi, 101)
    idx = np.searchsorted(f_sorted, grid, side="right") - 1
    best = np.where(idx >= 0, r_best[np.clip(idx, 0, None)], 0.0)
    return float(best.mean())
