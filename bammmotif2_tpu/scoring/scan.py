"""Occurrence scanning: log-odds scores, empirical p-values, .occurrence.

TPU-native equivalent of ``src/seq_scoring/ScoreSeqSet.{h,cpp}``
(``calcLogOdds``, ``calcPvalues``, ``write``): reuses the EM window-score
op against the combined LUT, computes empirical p-values by rank against a
sorted negative-score distribution (vectorized searchsorted instead of the
reference's per-score scan), and writes occurrence rows above the p-value
cutoff.

p-value convention (SURVEY.md 2.9): for a score s against M sorted negative
scores, p(s) = (#neg >= s + 1) / (M + 1), with linear interpolation between
adjacent negative scores; e-value = p * (#windows scanned in the dataset).
"""

from __future__ import annotations

import dataclasses
import os

import jax.numpy as jnp
import numpy as np

from bammmotif2_tpu.models.background import BackgroundModel
from bammmotif2_tpu.models.motif import Motif, log_odds_lut
from bammmotif2_tpu.ops import encode, escore
from bammmotif2_tpu.utils.fasta import SequenceSet


@dataclasses.dataclass
class ScanResult:
    """Per-window scores; stays device-resident until a host view is asked.

    Device->host traffic is the scanner's real cost at genome scale (the
    score tensor is ~40x the input), so ZOOPS maxima, p-values, and
    occurrence extraction all reduce ON DEVICE; only reductions and hit
    rows cross to the host.
    """

    scores_dev: object      # jnp [S, N, n_win] log-odds (NEG_INF invalid)
    mask_dev: object        # jnp bool [N, n_win]
    max_scores: np.ndarray  # [N] best window per sequence (ZOOPS statistic)
    n_windows: int          # total valid windows scanned
    W: int
    _scores_host: np.ndarray | None = None

    @property
    def scores(self) -> np.ndarray:
        if self._scores_host is None:
            self._scores_host = np.asarray(self.scores_dev)
        return self._scores_host

    @property
    def mask(self) -> np.ndarray:
        return np.asarray(self.mask_dev)

    def all_window_scores(self) -> np.ndarray:
        """Valid per-window scores pooled over strands (MOPS statistic)."""
        m = np.broadcast_to(self.mask[None], self.scores.shape)
        return self.scores[m]


def score_set(
    motif: Motif,
    bg: BackgroundModel,
    sset: SequenceSet,
    ss: bool = False,
    batch: int = 16384,
) -> ScanResult:
    """Log-odds-score every window of every sequence (ScoreSeqSet::calcLogOdds).

    Sequences are processed in batches of ``batch`` so genome-scale sets
    (BASELINE config 5: 100k sequences) stream through HBM.
    """
    import jax

    K, W = motif.K, motif.W
    A = motif.A
    s_flat = log_odds_lut(
        tuple(jnp.asarray(v, jnp.float32) for v in motif.v),
        jnp.asarray(bg.conditional_flat(K), jnp.float32),
    )
    use_pallas = False
    if jax.default_backend() == "tpu":
        from bammmotif2_tpu.ops import pallas_em

        use_pallas = pallas_em.supported(K, A)
        map5 = jnp.asarray(encode.map_base5_to_combined(A, K))
    chunks, mask_chunks = [], []
    for start in range(0, sset.n, batch):
        sub = sset.subset(np.arange(start, min(start + batch, sset.n)))
        if use_pallas:
            qidx = encode.strand_base5_indices(sub, K, ss)
            lens = jnp.asarray(sub.lens)
            sc, m = pallas_em.window_scores(
                s_flat, qidx, lens, map5, A=A, K=K, W=W
            )
        else:
            cidx, lens = encode.strand_indices(sub, K, ss)
            sc, m = escore.window_scores(s_flat, cidx, lens, W)
        chunks.append(sc)
        mask_chunks.append(m)
    n_win_max = max(c.shape[2] for c in chunks)
    S = chunks[0].shape[0]

    def padw(x, fill):
        p = n_win_max - x.shape[-1]
        if p == 0:
            return x
        cfg = [(0, 0)] * (x.ndim - 1) + [(0, p)]
        return jnp.pad(x, cfg, constant_values=fill)

    scores = jnp.concatenate([padw(c, escore.NEG_INF) for c in chunks], axis=1)
    mask = jnp.concatenate([padw(m, False) for m in mask_chunks], axis=0)
    max_scores = np.asarray(jnp.max(scores, axis=(0, 2)))  # N floats only
    n_valid = int(mask.sum()) * S
    return ScanResult(
        scores_dev=scores,
        mask_dev=mask,
        max_scores=max_scores,
        n_windows=n_valid,
        W=W,
    )


def empirical_pvalues(scores: np.ndarray, neg_scores: np.ndarray) -> np.ndarray:
    """Empirical p-values by rank against a negative score sample.

    Parity: ``ScoreSeqSet::calcPvalues``.  With Sn = sorted negative scores
    (ascending, size M): p(s) = (M - rank_hi(s) + 1) / (M + 1) where
    rank_hi = #neg < s, linearly interpolated between neighboring negative
    scores so ties don't quantize small p-values.
    """
    neg = np.sort(np.asarray(neg_scores, np.float64))
    M = neg.size
    if M == 0:
        return np.full(np.shape(scores), 1.0)
    s = np.asarray(scores, np.float64)
    lo = np.searchsorted(neg, s, side="left")    # #neg strictly below s
    hi = np.searchsorted(neg, s, side="right")   # #neg <= s
    # interpolate within the tie block / between neighbors
    frac = np.where(hi > lo, 0.5 * (lo + hi), lo).astype(np.float64)
    p = (M - frac + 1.0) / (M + 1.0)
    return np.clip(p, 1.0 / (M + 1.0), 1.0)


@dataclasses.dataclass
class Occurrence:
    seq_idx: int
    header: str
    length: int
    strand: str       # '+' or '-'
    start: int        # 0-based inclusive, forward-strand coordinates
    end: int          # 0-based exclusive
    site: str
    score: float
    pvalue: float
    evalue: float


def find_occurrences(
    scan: ScanResult,
    sset: SequenceSet,
    neg_scores: np.ndarray,
    pval_cutoff: float = 1e-4,
) -> list:
    """Windows with p-value below the cutoff, as occurrence records.

    Reverse-strand windows are reported in forward coordinates
    (start = len - W - i for rc-window start i), matching the reference's
    convention of scanning the appended reverse complement.
    """
    sc = scan.scores_dev
    S, N, n_win = sc.shape
    W = scan.W
    # p-values + thresholding on device; only hit rows cross to host
    neg = jnp.sort(jnp.asarray(neg_scores, jnp.float32))
    M = int(neg.size)
    lo = jnp.searchsorted(neg, sc, side="left")
    hi = jnp.searchsorted(neg, sc, side="right")
    frac = jnp.where(hi > lo, 0.5 * (lo + hi), lo).astype(jnp.float32)
    pv_dev = jnp.clip((M - frac + 1.0) / (M + 1.0), 1.0 / (M + 1.0), 1.0)
    valid = jnp.broadcast_to(scan.mask_dev[None], sc.shape)
    hitmask = (valid & (pv_dev <= pval_cutoff)).ravel()
    n_hits = int(hitmask.sum())
    if n_hits == 0:
        return []
    flat = jnp.nonzero(hitmask, size=n_hits)[0]
    hit_scores = np.asarray(sc.ravel()[flat])
    hit_pv = np.asarray(pv_dev.ravel()[flat])
    s_i, n_i, i_i = np.unravel_index(np.asarray(flat), (S, N, n_win))

    occs: list = []
    for s, n, i, score, p in zip(s_i, n_i, i_i, hit_scores, hit_pv):
        L = int(sset.lens[n])
        if s == 0:
            start, strand = int(i), "+"
            site = sset.alphabet.decode(sset.codes[n, start : start + W])
        else:
            start, strand = L - W - int(i), "-"
            site = sset.alphabet.decode(
                sset.alphabet.revcomp(sset.codes[n, start : start + W])
            )
        occs.append(
            Occurrence(
                seq_idx=int(n),
                header=sset.headers[n],
                length=L,
                strand=strand,
                start=start,
                end=start + W,
                site=site,
                score=float(score),
                pvalue=float(p),
                evalue=float(p * scan.n_windows),
            )
        )
    occs.sort(key=lambda o: (o.seq_idx, o.start, o.strand))
    return occs


def write_occurrences(path: str | os.PathLike, occs: list) -> None:
    """TSV occurrence rows (ScoreSeqSet::write → <basename>.occurrence).

    Columns: seq header, seq length, strand, start..end (1-based inclusive,
    as in the reference output), site string, log-odds score, p-value,
    e-value.
    """
    with open(path, "w") as fh:
        fh.write("header\tlength\tstrand\tstart..end\tsite\tscore\tp-value\te-value\n")
        for o in occs:
            fh.write(
                f"{o.header}\t{o.length}\t{o.strand}\t{o.start + 1}..{o.end}\t"
                f"{o.site}\t{o.score:.6g}\t{o.pvalue:.4e}\t{o.evalue:.4e}\n"
            )
