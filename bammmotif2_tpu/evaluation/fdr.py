"""Cross-validated FDR evaluation of motif quality.

TPU-native equivalent of ``src/evaluation/FDR.{h,cpp}``
(``FDR::evaluateMotif``, ``calculatePR``, ``calculatePvalues``, ``write``):

  for each of --cvFold folds: refine a copy of the seed motif on the other
  folds (reusing the EM engine), obtain negatives (user-provided via
  --negSeqFile, folded like the positives; otherwise sampled at
  --mFold x |heldout| from an order---sOrder background fit to the training
  positives), score held-out positives and negatives, pool ZOOPS
  (max-per-sequence) and MOPS (per-window) scores across folds, then sweep
  thresholds for precision/recall and per-score empirical p-values.

TPU-first fold mechanics (SURVEY.md 3.5 "folds are just masks"): the
sequence set is tensorized ONCE; a fold's train/test split is expressed by
zeroing the held-out/held-in rows of the length vector (a zero-length row
has no valid windows and contributes nothing to counts).  Every fold
therefore reuses the SAME compiled programs — one EM convergence loop, one
positive scorer, one negative sampler + scorer — instead of recompiling
per fold for each subset's shape.

Outputs ``.zoops.stats`` / ``.mops.stats`` TSVs.  Downstream AvRec/AUSFC
plotting lives in companion repos (SURVEY.md 2: FDR row) and is out of
scope; the stats files carry all needed columns.
"""

from __future__ import annotations

import dataclasses
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from bammmotif2_tpu.evaluation import prcurve
from bammmotif2_tpu.generator import seqgen
from bammmotif2_tpu.models import motif as motif_mod
from bammmotif2_tpu.models.background import BackgroundModel
from bammmotif2_tpu.models.motif import Motif
from bammmotif2_tpu.ops import escore
from bammmotif2_tpu.refinement.em import choose_path, prepare_data, run_em
from bammmotif2_tpu.scoring.scan import empirical_pvalues
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


MAX_STATS_ROWS = 20_000  # written rows per .stats file (sweep stays full)


def _write_stats(path: str, sweep: dict, max_rows: int = MAX_STATS_ROWS) -> None:
    """One TSV row per sweep point, uniformly thinned past ``max_rows``.

    The in-memory sweep keeps every pooled score (AvRec and p-values use
    the full resolution); only the WRITTEN file is thinned.  Documented
    deviation: the reference writes one row per pooled score, which at
    MOPS/window scale (23M rows for 10k x 200 bp x mFold 10) produces
    gigabyte files and dominated end-to-end wall-clock; endpoints are
    always kept so the written curve spans the full range.
    """
    n = len(sweep["score"])
    idx = (
        np.unique(np.round(np.linspace(0, n - 1, max_rows)).astype(np.int64))
        if n > max_rows
        else range(n)
    )
    with open(path, "w") as fh:
        fh.write("score\tTP\tFP\tprecision\trecall\tp-value\n")
        for i in idx:
            fh.write(
                f"{sweep['score'][i]:.6g}\t{sweep['tp'][i]:.3f}\t{sweep['fp'][i]:.3f}\t"
                f"{sweep['precision'][i]:.6f}\t{sweep['recall'][i]:.6f}\t"
                f"{sweep['pvalue'][i]:.4e}\n"
            )


@functools.partial(jax.jit, static_argnames=("A", "K", "W", "path"))
def _fold_scores(v: tuple, data: dict, lens, *, A: int, K: int, W: int, path: str):
    """Score every window of the rows selected by ``lens`` (0 = masked out).

    One compiled program serves every fold: only the (static-shape) length
    vector changes.  Returns (max_per_seq [N], scores [S, N, n_win], mask
    [N, n_win]); masked rows score NEG_INF / False.
    """
    s_flat = motif_mod.log_odds_lut(v, data["bg_flat"])
    if path.startswith("pallas"):
        from bammmotif2_tpu.ops import pallas_em

        scores, mask = pallas_em.window_scores(
            s_flat, data["cidx"], lens,
            A=A, K=K, W=W, interpret=path.endswith("interpret"),
        )
    else:
        scores, mask = escore.window_scores(s_flat, data["cidx"], lens, W)
    return jnp.max(scores, axis=(0, 2)), scores, mask


@functools.partial(jax.jit, static_argnames=("n_rows",))
def _select_rows(scores, mask, rows, n_rows: int):
    """Device-side row gather before the host fetch.

    ``rows``: [n_rows] int32 selected sequence indices, -1 padding.  The
    scorer's static shapes cover ALL N rows with the unselected ones
    length-masked; fetching the full [S, N, n_win] tensor moves ~cvFold x
    the needed bytes per fold (151 MB/fold at 100k seqs), so the held-out
    rows are gathered on device first.
    """
    valid_row = rows >= 0
    safe = jnp.maximum(rows, 0)
    return scores[:, safe, :], mask[safe] & valid_row[:, None]


def _collect_scores(v: tuple, data: dict, lens_np: np.ndarray, row_sel: np.ndarray,
                    *, A: int, K: int, W: int, path: str):
    """ZOOPS maxima (host) + the fold's MOPS scores as a DEVICE array.

    Returns (max_per_seq [n_sel] host, mops_flat device f32 with -inf on
    invalid/pad windows, n_true valid-window count).  The MOPS pool stays
    ON DEVICE — it feeds prcurve.threshold_sweep_device, so the
    tens-of-millions-of-windows pool never crosses to the host (fetching
    it cost gigabytes per motif at 10k-seq mFold-10 scale).  Sparse
    selections (held-out CV folds) additionally gather their rows on
    device so the retained array is fold-sized, not set-sized.
    """
    lens_dev = jnp.asarray(np.where(row_sel, lens_np, 0).astype(lens_np.dtype))
    max_s, scores, mask = _fold_scores(v, data, lens_dev, A=A, K=K, W=W, path=path)
    max_h = np.asarray(max_s)[row_sel]
    n_sel = int(row_sel.sum())
    if n_sel * 2 <= row_sel.size:
        # fold sizes differ by <= 1, so at most two compiled shapes per run
        rows = np.nonzero(row_sel)[0].astype(np.int64)
        sc, mk = _select_rows(scores, mask, jnp.asarray(rows), n_sel)
    else:
        sc, mk = scores, mask  # unselected rows are length-masked already
    flat = jnp.where(mk[None], sc, escore.NEG_INF).ravel()
    S = scores.shape[0]
    n_true = int(
        S * np.sum(np.maximum(lens_np[row_sel].astype(np.int64) - W + 1, 0))
    )
    return max_h, flat, n_true


def evaluate_motif(
    seed_motif: Motif,
    bg: BackgroundModel,
    sset: SequenceSet,
    params: Params | None = None,
    refine: str | None = None,
    neg_set: SequenceSet | None = None,
) -> FDRResult:
    """k-fold CV FDR analysis (``FDR::evaluateMotif``).

    ``refine``: 'EM' (default), 'CGS', or None (score the seed as-is).
    Folds are assigned round-robin by sequence index (deterministic).

    ``neg_set``: user-provided negatives (``--negSeqFile``).  When given,
    they are folded round-robin like the positives and the held-out
    negative fold is scored against the fold-trained motif — fully
    deterministic FDR statistics (the reference scores provided negatives
    the same way).  When absent, negatives are sampled per fold from an
    order---sOrder background fit to the TRAINING positives.
    """
    params = params or Params(FDR=True)
    if refine is None:
        refine = "CGS" if params.CGS else "EM"
    n_folds = max(1, params.cvFold)
    fold_of = np.arange(sset.n) % n_folds

    A, K, W = seed_motif.A, seed_motif.K, seed_motif.W
    data = prepare_data(sset, bg, K, params.ss)
    lens_np = np.asarray(sset.lens, np.int32)
    path = choose_path(params, K, A=A)

    if neg_set is not None:
        neg_fold_of = np.arange(neg_set.n) % n_folds
        neg_data = prepare_data(neg_set, bg, K, params.ss)
        neg_lens_np = np.asarray(neg_set.lens, np.int32)
    else:
        # static sampled-negative geometry shared by every fold: row count
        # padded to mFold x (largest fold), lengths padded to the global max
        fold_sizes = np.bincount(fold_of, minlength=n_folds)
        n_neg_pad = int(fold_sizes.max()) * max(params.mFold, 1)
        neg_pad_len = int(lens_np.max()) if lens_np.size else 0

    pos_zoops, neg_zoops = [], []
    pos_mops, neg_mops = [], []  # DEVICE flat arrays (-inf padded)
    n_pos_mops = n_neg_mops = 0
    for f in range(n_folds):
        test_sel = fold_of == f
        train_sel = ~test_sel
        if not test_sel.any():
            continue

        m = seed_motif.copy()
        if train_sel.any():
            # train on the SAME tensors with held-out rows length-masked;
            # identical shapes every fold -> one compiled EM/CGS program
            tdata = {
                **data,
                "lens": jnp.asarray(np.where(train_sel, lens_np, 0)),
            }
            n_train = int(train_sel.sum())
            if refine == "EM":
                run_em(m, bg, sset, params, data=tdata, n_real=n_train)
            elif refine == "CGS":
                from bammmotif2_tpu.refinement.gibbs import run_gibbs

                run_gibbs(m, bg, sset, params, data=tdata, n_real=n_train)

        v = tuple(jnp.asarray(vk, jnp.float32) for vk in m.v)
        pz, pm, pm_n = _collect_scores(
            v, data, lens_np, test_sel, A=A, K=K, W=W, path=path
        )
        pos_zoops.append(pz)
        pos_mops.append(pm)
        n_pos_mops += pm_n

        if neg_set is not None:
            neg_sel = neg_fold_of == f
            if neg_sel.any():
                nz, nm, nm_n = _collect_scores(
                    v, neg_data, neg_lens_np, neg_sel, A=A, K=K, W=W, path=path
                )
                neg_zoops.append(nz)
                neg_mops.append(nm)
                n_neg_mops += nm_n
        else:
            # negatives: order-sOrder model fit to TRAINING positives
            train_set = (
                sset.subset(np.nonzero(train_sel)[0])
                if train_sel.any()
                else sset.subset(np.nonzero(test_sel)[0])
            )
            bg_fit = BackgroundModel.from_sequence_set(
                train_set, order=params.sOrder, alpha=params.bgModelAlpha,
                ss=params.ss,
            )
            # sampling + revcomp + encoding fused in one device program;
            # same PRNG keys as generate_neg_set -> identical sequences
            neg_cidx, neg_lens = seqgen.generate_neg_data(
                bg_fit, lens_np[test_sel], m_fold=params.mFold,
                seed=params.seed + f, K=K, ss=params.ss,
                n_pad=n_neg_pad, pad_len=neg_pad_len,
            )
            sdata = {
                "cidx": neg_cidx,
                "lens": jnp.asarray(neg_lens),
                "bg_flat": data["bg_flat"],
            }
            nz, nm, nm_n = _collect_scores(
                v, sdata, np.asarray(neg_lens, np.int32),
                neg_lens > 0, A=A, K=K, W=W, path=path,
            )
            neg_zoops.append(nz)
            neg_mops.append(nm)
            n_neg_mops += nm_n

    pz = np.concatenate(pos_zoops)
    nz = np.concatenate(neg_zoops) if neg_zoops else np.zeros(0)
    pm = jnp.concatenate(pos_mops)
    nm = jnp.concatenate(neg_mops) if neg_mops else jnp.zeros(0, jnp.float32)

    # FP normalization: sampled negatives are an mFold-times oversample of
    # the positives; user-provided negatives count at their true ratio
    m_fold_eff = (
        max(params.mFold, 1) if neg_set is None else neg_set.n / max(sset.n, 1)
    )
    return FDRResult(
        zoops=prcurve.threshold_sweep(pz, nz, m_fold_eff),
        # negatives share the positives' length distribution (sampled case),
        # so the MOPS window count is also mFold x the positive window
        # count; the window-scale pool sorts/sweeps ON DEVICE and only a
        # thinned table crosses to the host
        mops=prcurve.threshold_sweep_device(
            pm, nm, m_fold_eff, n_pos_mops, n_neg_mops
        ),
        pos_pvalues=empirical_pvalues(pz, nz),
        m_fold=params.mFold,
    )
