"""Cross-validated FDR evaluation of motif quality.

TPU-native equivalent of ``src/evaluation/FDR.{h,cpp}``
(``FDR::evaluateMotif``, ``calculatePR``, ``calculatePvalues``, ``write``):

  for each of --cvFold folds: refine a copy of the seed motif on the other
  folds (reusing the EM engine), sample --mFold x |heldout| negatives from
  an order---sOrder background fit to the training positives (on-device
  PRNG, generator.seqgen), score held-out positives and negatives, pool
  ZOOPS (max-per-sequence) and MOPS (per-window) scores across folds, then
  sweep thresholds for precision/recall and per-score empirical p-values.

Outputs ``.zoops.stats`` / ``.mops.stats`` TSVs.  Downstream AvRec/AUSFC
plotting lives in companion repos (SURVEY.md 2: FDR row) and is out of
scope; the stats files carry all needed columns.
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np

from bammmotif2_tpu.evaluation import prcurve
from bammmotif2_tpu.generator import seqgen
from bammmotif2_tpu.models.background import BackgroundModel
from bammmotif2_tpu.models.motif import Motif
from bammmotif2_tpu.refinement.em import run_em
from bammmotif2_tpu.scoring.scan import empirical_pvalues, score_set
from bammmotif2_tpu.utils.config import Params
from bammmotif2_tpu.utils.fasta import SequenceSet


@dataclasses.dataclass
class FDRResult:
    zoops: dict  # threshold sweep arrays for max-per-sequence scores
    mops: dict   # threshold sweep arrays for per-window scores
    pos_pvalues: np.ndarray  # per held-out-positive ZOOPS-score p-values
    m_fold: int

    def write(self, outdir: str, basename: str) -> list:
        os.makedirs(outdir, exist_ok=True)
        paths = []
        for tag, sweep in (("zoops", self.zoops), ("mops", self.mops)):
            path = os.path.join(outdir, f"{basename}.{tag}.stats")
            _write_stats(path, sweep)
            paths.append(path)
        return paths


def _write_stats(path: str, sweep: dict) -> None:
    with open(path, "w") as fh:
        fh.write("score\tTP\tFP\tprecision\trecall\tp-value\n")
        for i in range(len(sweep["score"])):
            fh.write(
                f"{sweep['score'][i]:.6g}\t{sweep['tp'][i]:.3f}\t{sweep['fp'][i]:.3f}\t"
                f"{sweep['precision'][i]:.6f}\t{sweep['recall'][i]:.6f}\t"
                f"{sweep['pvalue'][i]:.4e}\n"
            )


def evaluate_motif(
    seed_motif: Motif,
    bg: BackgroundModel,
    sset: SequenceSet,
    params: Params | None = None,
    refine: str | None = None,
) -> FDRResult:
    """k-fold CV FDR analysis (``FDR::evaluateMotif``).

    ``refine``: 'EM' (default), 'CGS', or None (score the seed as-is).
    Folds are assigned round-robin by sequence index (deterministic).
    """
    params = params or Params(FDR=True)
    if refine is None:
        refine = "CGS" if params.CGS else "EM"
    n_folds = max(1, params.cvFold)
    fold_of = np.arange(sset.n) % n_folds

    pos_zoops, neg_zoops = [], []
    pos_mops, neg_mops = [], []
    for f in range(n_folds):
        test_idx = np.nonzero(fold_of == f)[0]
        train_idx = np.nonzero(fold_of != f)[0]
        if len(test_idx) == 0:
            continue
        test_set = sset.subset(test_idx)
        train_set = sset.subset(train_idx) if len(train_idx) else test_set

        m = seed_motif.copy()
        if len(train_idx):
            if refine == "EM":
                run_em(m, bg, train_set, params)
            elif refine == "CGS":
                from bammmotif2_tpu.refinement.gibbs import run_gibbs

                run_gibbs(m, bg, train_set, params)

        # negatives: order-sOrder model fit to TRAINING positives
        bg_fit = BackgroundModel.from_sequence_set(
            train_set, order=params.sOrder, alpha=params.bgModelAlpha, ss=params.ss
        )
        neg_set = seqgen.generate_neg_set(
            bg_fit, test_set.lens, m_fold=params.mFold, seed=params.seed + f
        )

        pos_scan = score_set(m, bg, test_set, ss=params.ss)
        neg_scan = score_set(m, bg, neg_set, ss=params.ss)
        pos_zoops.append(pos_scan.max_scores)
        neg_zoops.append(neg_scan.max_scores)
        pos_mops.append(pos_scan.all_window_scores())
        neg_mops.append(neg_scan.all_window_scores())

    pz = np.concatenate(pos_zoops)
    nz = np.concatenate(neg_zoops)
    pm = np.concatenate(pos_mops)
    nm = np.concatenate(neg_mops)

    return FDRResult(
        zoops=prcurve.threshold_sweep(pz, nz, params.mFold),
        # negatives share the positives' length distribution, so the MOPS
        # window count is also mFold x the positive window count
        mops=prcurve.threshold_sweep(pm, nm, params.mFold),
        pos_pvalues=empirical_pvalues(pz, nz),
        m_fold=params.mFold,
    )
