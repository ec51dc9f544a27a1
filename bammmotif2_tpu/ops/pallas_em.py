"""Fused Pallas TPU kernel for one EM iteration's data pass.

The XLA fallback (ops.escore) walks HBM four times per iteration (gather
scores, normalize, materialize responsibilities, scatter counts) and the
arbitrary-index gather/scatter ops serialize badly on TPU (~380 ms each on
a v5e for the 10k x 200 bp order-2 benchmark).  This kernel does the whole
pass in ONE sweep over the sequence data with zero gathers/scatters.

Layout: sequences map to SUBLANES, positions to LANES.  Each block holds B
sequences as a (B, SLp) tile whose row b is that sequence's positions
(strand-major, forward then reverse-complement, lane-padded to SLp).  That
makes every ZOOPS reduction a native per-row VPU op — segment max/sum are
``jnp.max/sum(axis=1)``, broadcasts are (B, 1) -> (B, SLp) — with no
cross-sequence traffic at all:

  * Indexing uses the COMBINED-LUT row space directly (ops.encode.
    combined_kmer_index, the same ``cidx`` tensor the gather path uses):
    row = off[m] + lexicographic (m+1)-mer code with m the truncated
    context order, sentinel row R for invalid positions.  The kernel
    never interprets the code — it only compares/divides it — so the
    one-hot space needs only Q = R+1 rows ((A^(K+2)-A)/(A-1)+1; 5,461 at
    A=4, K=5) instead of the (A+1)^(K+1) of a per-digit code space
    (15,625): 2.9x fewer MXU MACs at K=5, exact order-truncation
    semantics with no code->row remap gather and no count segment-sum.
  * Per sequence row b, the transposed one-hot ``oh_b[c, i] = (code[b, i]
    == c)`` is an iota compare built IN VMEM (never touches HBM), exactly
    representable in bf16.
  * E-step scores  P[b] = s^T @ oh_b  -> (Wp, SLp) per row        (MXU)
  * Window scores  sc[b, i] = sum_j P[b, j, i+j]  -> W lane-rolls (VPU)
  * ZOOPS posterior: per-row max / exp / sum / divide             (VPU)
  * M-step counts  C += oh_b @ Rw_b^T, Rw_b[j, i] = r[b, i-j]     (MXU)

Seed stacking (the MXU-fill lever): the E-step matmul's output dimension
is only NT*Wp rows (48 of 128 at W=12) — the workload's own shape caps
MXU utilization at 37.5% for a single seed.  ``em_counts_multi`` stacks M
seeds' LUTs along the matmul OUTPUT rows (one shared one-hot per sequence
row scores and counts every seed at once, M*NT*Wp rows), which is the
TPU-native form of the reference driver's OpenMP-over-motifs
(SURVEY.md 3.1) and makes multi-seed runs (--maxPWM N, BASELINE config 4)
fill the MXU instead of dispatching M under-filled kernels.

High orders (hi/lo split): a full one-hot over Q rows stops fitting VMEM
past Q ~ a few hundred, so the row index is split as ``c = c_hi * Qlo +
c_lo`` with Qlo = 128 (one MXU lane-tile; the div/mod lowers to a shift/
mask) and Qhi = ceil(Q/128) (<= 43 for A=4, K=5).  Only the LOW one-hot
is materialized and contracted on the MXU against the LUT regrouped as
(Qlo, Qhi*W); the few hi values then resolve as VPU masked accumulates
``P[b, j] = sum_h V[h*W+j] * [c_hi == h]`` (and transposed for counts).
Q <= 128 (A=4, K <= 2) degenerates to Qhi = 1 and skips the mask
entirely.

Matmul precision: the MXU is bf16; instead of ``Precision.HIGHEST`` (6
bf16 passes emulating fp32 x fp32) the f32 operand is split into bf16
residual terms and multiplied against the EXACT bf16 one-hot — 3 terms
reproduce full f32 precision in half the passes (scores), 2 terms are
used for the counts matmul whose error is dominated by the ~5e-6 relative
rounding of the posterior normalization either way.  The LUT's term split
is precomputed ONCE outside the kernel (a (QloP, NT*Wt) bf16 input), and
when the stacked output height NT*Wt still has partial 128-row MXU tiles
(Wt <= TERM_STACK_MAX_WT) all terms issue as ONE dot — fewer partial
tiles than NT separate dots.

HBM traffic per iteration ~= one read of the int32 code tensor.  Counts
return directly in combined-row space.

Parity: produces equivalent-to-tolerance counts/likelihood vs ops.escore
(<= 1e-5; asserted in tests/test_pallas_em.py and on-device).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bammmotif2_tpu.ops import encode
from bammmotif2_tpu.ops.escore import NEG_INF

LANE = 128
SUBLANE = 8
MAX_B = 64  # larger blocks exceed v5e VMEM (2 scratch (B, M*Wp, SLp) tensors)
MAX_QHI = 128  # hi values resolved by VPU masked accumulation
MAX_SEEDS = 32  # seed-stack upper bound probed by max_seeds()
_VMEM_BUDGET = 10 * 1024 * 1024  # bytes of in-kernel temporaries to aim for
# huge-Qhi geometries (K=5 at A=4: Qhi=43) get a larger allowance: the
# r5 A/B measured G=2->4 at 14 MB as 27.4 -> 26.1 ms/iter (+5%), while
# the same raise moved K<=4 by <1% (B was not the binding constraint
# there) — so the bigger budget is scoped to where it measured a win
_VMEM_BUDGET_HIQ = 14 * 1024 * 1024
_HIQ_THRESHOLD = 16  # Qhi above this uses _VMEM_BUDGET_HIQ

NT_SCORES = 3  # bf16 split terms for the E-step matmul (3 == full f32)
NT_COUNTS = 2  # for the M-step matmul (posterior rounding dominates anyway)

# hi/lo (Qhi > 1) per-row fori_loops: partial unroll factor.  1 = strict
# sequential (round-3 behavior); 2 lets Mosaic interleave row b's VPU
# masked-accumulates with row b+1's MXU contraction at 2x the transient
# VMEM.  Geometry accounts for it; A/B'd on hardware.
HI_UNROLL = 1

# issue all bf16 terms as one stacked dot only while the un-stacked output
# height Wt leaves partial 128-row MXU tiles to recover; past this the
# stacked (NT*Wt, SLp) f32 transient costs VMEM for ~no tile savings
TERM_STACK_MAX_WT = 512


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _hi_lo(K: int, A: int) -> tuple[int, int]:
    """(Qlo, Qhi) split of the Q = R+1 combined-row space.

    Qlo is one full MXU lane-tile (or all of Q when it fits in one), so
    the low one-hot contraction is maximally dense and the hi fan-out
    Qhi = ceil(Q/128) is as small as the row space allows — the row
    space being the combined-LUT rows themselves, which are ~3x fewer
    than any per-digit code space at high K."""
    Q = encode.num_rows(A, K) + 1
    if Q <= LANE:
        return Q, 1
    return LANE, -(-Q // LANE)


def supported(K: int, A: int = 4) -> bool:
    Qlo, Qhi = _hi_lo(K, A)
    return Qhi <= MAX_QHI


def _geometry(A, K, W, S, L, M=1):
    Q = encode.num_rows(A, K) + 1  # combined rows + sentinel
    Qlo, Qhi = _hi_lo(K, A)
    QloP = _round_up(Qlo, LANE)
    Wp = _round_up(W, SUBLANE)
    SLp = _round_up(S * L, LANE)
    Wt = M * Qhi * Wp  # stacked matmul output height (seed-major)
    stack_terms = Wt <= TERM_STACK_MAX_WT
    nt_live = (NT_SCORES + NT_COUNTS) if stack_terms else 2

    # per-sequence: the two (M*Wp, SLp) f32 scratch planes + ~8 (B, SLp)
    # row temporaries; when the per-row loops unroll (Qhi == 1) Mosaic
    # stacks each row's (Wt, SLp) matmul transient, so budget it per row
    per_seq = SLp * (8 * M * Wp + 32)
    if Qhi == 1:
        per_seq += 4 * Wt * SLp

    def fixed_bytes(G):
        # fixed per-block VMEM: low one-hot (bf16), term-stacked LUT
        # (bf16), counts accumulator (f32), E/M matmul transients (f32;
        # all terms at once when term-stacked, one term otherwise) — the
        # one-hot and transients widen G-fold on the hi/lo path
        return (
            QloP * G * SLp * 2
            + QloP * NT_SCORES * Wt * 2
            + QloP * Wt * 4
            + nt_live * Wt * G * SLp * 4
        )

    # hi/lo (Qhi > 1) loops: G sequences share each dot by LANE
    # concatenation — same MAC count in G-fold fewer, wider MXU dispatches.
    # Measured on a v5e (10k x 200 bp, W=12): K=3 8.1 -> 4.3 ms/iter,
    # K=4 12.4 -> 9.9 with G=4/2; K=5 unchanged-at-G=1 was re-enabled by
    # this budget rule (fixed + room for >= 8-sequence blocks).
    budget = _VMEM_BUDGET_HIQ if Qhi > _HIQ_THRESHOLD else _VMEM_BUDGET
    G = 1
    if Qhi > 1:
        for cand in (4, 2):
            if fixed_bytes(cand) + 8 * per_seq <= budget:
                G = cand
                break
    fixed = fixed_bytes(G)
    avail = max(budget - fixed, per_seq)
    B = max(1, min(MAX_B, avail // per_seq))
    B = max(G, (B // G) * G)  # the G-row loop needs B % G == 0
    return dict(
        Q=Q, Qlo=Qlo, Qhi=Qhi, QloP=QloP, Wp=Wp, SLp=SLp, B=B,
        M=M, Wt=Wt, stack_terms=stack_terms, G=G,
        fixed=fixed, per_seq=per_seq, budget=budget,
    )


# measured seed-stack sweep on a v5e (10k x 200 bp, K=2, W=12): aggregate
# peaks at M ~ 4-6 (2.94 B w/s) and declines past it as VMEM pressure
# shrinks the sequence block; two balanced chunks of 5 beat one stack of
# 10 (12.96 vs 14.25 ms/iter)
SWEET_SPOT_M = 6


def max_seeds(K: int, W: int, *, A: int = 4, S: int = 2, L: int = 256) -> int:
    """Largest efficient seed-stack M for em_counts_multi on this problem
    geometry (>= 1).  refinement.multi splits larger groups into balanced
    chunks of at most this.

    Bounded by VMEM (with room for blocks of >= 8 sequences — tiny blocks
    trade the MXU-fill win back away as grid overhead) and by the measured
    throughput sweet spot SWEET_SPOT_M."""
    for M in range(SWEET_SPOT_M, 1, -1):
        g = _geometry(A, K, W, S, L, M)
        if g["fixed"] + 8 * g["per_seq"] <= g["budget"]:
            return M
    return 1


def _split_terms(x, n):
    """x (f32) == sum of n bf16 residual terms (exact for n >= 3).

    IN-KERNEL (Mosaic) use only — Mosaic rounds the astype for real.
    XLA-side callers must use _split_terms_xla (see its docstring)."""
    terms = []
    r = x
    for i in range(n):
        t = r.astype(jnp.bfloat16)
        terms.append(t)
        if i + 1 < n:
            r = r - t.astype(jnp.float32)
    return terms


def _split_terms_xla(x, n):
    """_split_terms for code that runs in XLA (outside the kernel).

    Under TPU XLA's default --xla_allow_excess_precision, a plain
    f32->bf16->f32 round trip is ELIDED inside jit, so the residual
    ``r - t`` silently collapses to zero and the scores matmul degrades
    to single-bf16 accuracy (~6e-3 relative; observed on hardware, same
    bug class as ops/pallas_flat.py round 3).  lax.reduce_precision
    forces the rounding."""
    terms, r = [], x
    for i in range(n):
        t32 = jax.lax.reduce_precision(r, exponent_bits=8, mantissa_bits=7)
        terms.append(t32.astype(jnp.bfloat16))
        if i + 1 < n:
            r = r - t32
    return terms


def _term_dot(terms_2d, nt, Wt, exact_bf16, dims, stack):
    """dot(term-stacked operand, exact bf16 one-hot) with f32 accumulate.

    terms_2d: bf16 with nt residual terms stacked term-major along its
    NON-contracted axis (columns for the E-step LUT, rows for the M-step
    responsibilities).  ``stack=True`` issues one dot over all terms and
    sums the nt output slices (fewer partial MXU tiles when Wt < 128);
    ``stack=False`` issues one dot per term slice (smaller f32 transients
    for large Wt).  Either way the f32 result is the exact sum of
    per-term products — identical rounding order.
    """
    if stack:
        V3 = jax.lax.dot_general(
            terms_2d, exact_bf16, dims, preferred_element_type=jnp.float32
        )
        # the operand's non-contracted axis is always result axis 0
        V = V3[0:Wt]
        for t in range(1, nt):
            V = V + V3[t * Wt : (t + 1) * Wt]
        return V
    cdim = dims[0][0][0]  # contracted axis of terms_2d; terms stack on 1-cdim
    out = None
    for t in range(nt):
        sl = (
            terms_2d[:, t * Wt : (t + 1) * Wt]
            if cdim == 0
            else terms_2d[t * Wt : (t + 1) * Wt, :]
        )
        p = jax.lax.dot_general(
            sl, exact_bf16, dims, preferred_element_type=jnp.float32
        )
        out = p if out is None else out + p
    return out


def _onehot_row(codes_row, Qp, SLp):
    """(Qp, SLp) bf16 transposed one-hot of one (1, SLp) code row."""
    iota_q = jax.lax.broadcasted_iota(jnp.int32, (Qp, SLp), 0)
    return (iota_q == jnp.broadcast_to(codes_row, (Qp, SLp))).astype(
        jnp.bfloat16
    )


def _row_of(qcodes_ref, b):
    """(1, SLp) code row b read from the (1, B, SLp) block ref; b may be a
    traced fori_loop index (Mosaic lowers dynamic ref slices, but not
    dynamic_slice on loaded arrays)."""
    return qcodes_ref[0, pl.ds(b, 1), :]


def _escore_row(codes_row, s5t_ref, *, M, Qhi, Qlo, QloP, Wp, SLp, stack):
    """E-step scores for one (1, SLp) code row: (M*Wp, SLp) seed-major
    position scores.

    s5t_ref holds the M seeds' LUTs' bf16 residual terms regrouped as
    (QloP, NT_SCORES * M*Qhi*Wp), column = t*Wt + (m*Qhi + h)*Wp + j
    (_term_stacked_lut) — the seed axis rides the matmul OUTPUT rows, so
    ONE shared one-hot scores every term of every seed.
    """
    Wt = M * Qhi * Wp
    lo = jax.lax.rem(codes_row, Qlo) if Qhi > 1 else codes_row
    oh_lo = _onehot_row(lo, QloP, SLp)
    V = _term_dot(
        s5t_ref[:], NT_SCORES, Wt, oh_lo, (((0,), (0,)), ((), ())), stack
    )  # (Wt, SLp)
    if Qhi == 1:
        return V  # (M*Wp, SLp), seed-major
    hi = jax.lax.div(codes_row, Qlo)  # (1, SLp)
    masks = [(hi == h).astype(jnp.float32) for h in range(Qhi)]
    parts = []
    for m in range(M):
        Pm = jnp.zeros((Wp, SLp), jnp.float32)
        for h in range(Qhi):
            Pm = Pm + V[(m * Qhi + h) * Wp : (m * Qhi + h + 1) * Wp, :] * masks[h]
        parts.append(Pm)
    return parts[0] if M == 1 else jnp.concatenate(parts, axis=0)


def _mstep_row(codes_row, rw_b, C5_ref, *, M, Qhi, Qlo, QloP, Wp, SLp, stack):
    """Accumulate counts for one row: C5_ref (QloP, M*Qhi*Wp) += oh_lo @
    RH^T where RH[(m*Qhi+h)*Wp + j, i] = rw_b[m*Wp + j, i] * [c_hi == h];
    RH's f32 values split into NT_COUNTS bf16 terms (stacked into one dot
    when ``stack``)."""
    lo = jax.lax.rem(codes_row, Qlo) if Qhi > 1 else codes_row
    oh_lo = _onehot_row(lo, QloP, SLp)
    if Qhi == 1:
        RH = rw_b  # (M*Wp, SLp) == (Wt, SLp)
    else:
        hi = jax.lax.div(codes_row, Qlo)
        masks = [(hi == h).astype(jnp.float32) for h in range(Qhi)]
        parts = []
        for m in range(M):
            rm = rw_b[m * Wp : (m + 1) * Wp, :]
            for h in range(Qhi):
                parts.append(rm * masks[h])
        RH = jnp.concatenate(parts, axis=0)  # (Wt, SLp)
    Wt = RH.shape[0]
    RH2 = jnp.concatenate(_split_terms(RH, NT_COUNTS), axis=0)
    G = _term_dot(
        RH2, NT_COUNTS, Wt, oh_lo, (((1,), (1,)), ((), ())), stack
    )  # (Wt, QloP)
    C5_ref[:] += G.T


def _kernel(
    q_ref, qcodes_ref, lens_ref, s5t_ref, ipos_ref,
    C5_ref, stats_ref, P3, rw3,
    *, B, S, W, SLp, Qlo, Qhi, QloP, Wp, M, SP, stack, G,
):
    @pl.when(pl.program_id(0) == 0)
    def _():
        C5_ref[:] = jnp.zeros_like(C5_ref)
        rw3[:] = jnp.zeros_like(rw3)
        # SMEM accepts only scalar stores — initialize element-wise
        for t in range(SP):
            stats_ref[0, t] = 0.0

    # E-step scores per row: P3[b, m*Wp + j, i] = s5[m][code[b, i], j].
    # Qhi == 1 (K <= 2 at A=4): Python-unrolled — Mosaic pipelines the per-row
    # matmuls (2.4x the fori_loop's throughput) and the per-row temporaries
    # are small enough to stack (budgeted in _geometry).  Qhi > 1: fori_loop —
    # the hi/lo masked temporaries are ~10x larger and an unrolled stack
    # overflows VMEM.
    def e_body(b, _):
        P = _escore_row(
            _row_of(qcodes_ref, b), s5t_ref,
            M=M, Qhi=Qhi, Qlo=Qlo, QloP=QloP, Wp=Wp, SLp=SLp, stack=stack,
        )
        P3[pl.ds(b, 1), :, :] = P.reshape(1, M * Wp, SLp)
        return 0

    def e_body_g(i, _):
        # G sequences share one dot: their code rows concatenate on LANES
        # (same MACs, G-fold fewer and wider MXU dispatches; measured
        # 1.9x at K=3 and 1.25x at K=4 on a v5e)
        b0 = i * G
        codes_g = jnp.concatenate(
            [_row_of(qcodes_ref, b0 + g) for g in range(G)], axis=1
        )  # (1, G*SLp)
        P = _escore_row(
            codes_g, s5t_ref,
            M=M, Qhi=Qhi, Qlo=Qlo, QloP=QloP, Wp=Wp, SLp=G * SLp,
            stack=stack,
        )  # (M*Wp, G*SLp)
        for g in range(G):
            P3[pl.ds(b0 + g, 1), :, :] = P[
                :, g * SLp : (g + 1) * SLp
            ].reshape(1, M * Wp, SLp)
        return 0

    if Qhi == 1:
        for b in range(B):
            e_body(b, 0)
    elif G == 1:
        jax.lax.fori_loop(0, B, e_body, 0, unroll=HI_UNROLL)
    else:
        jax.lax.fori_loop(0, B // G, e_body_g, 0, unroll=HI_UNROLL)

    # shared per-block geometry for the ZOOPS posterior
    lens = lens_ref[0]  # (B, 1) f32
    nwin = S * jnp.maximum(lens - (W - 1), 0.0)
    ipos = ipos_ref[:].astype(jnp.float32)  # (1, SLp); huge on pad lanes
    mask = (ipos + W) <= lens  # (B, SLp)

    # per-seed: window scores (lane rolls), ZOOPS posterior, rw fill.
    # window sums wrap within the row, which is harmless: wrapped windows
    # fail the i + W <= len mask
    for m in range(M):
        q = q_ref[0, m]
        log_r0 = jnp.log1p(-q)
        sc = P3[:, m * Wp, :]  # (B, SLp)
        for j in range(1, W):
            sc = sc + pltpu.roll(P3[:, m * Wp + j, :], (SLp - j) % SLp, axis=1)
        log_prior = jnp.where(
            nwin > 0, jnp.log(q) - jnp.log(jnp.maximum(nwin, 1.0)), NEG_INF
        )  # (B, 1)
        logw = jnp.where(mask, sc + log_prior, NEG_INF)
        mx = jnp.maximum(jnp.max(logw, axis=1, keepdims=True), log_r0)
        e = jnp.where(mask, jnp.exp(logw - mx), 0.0)
        z = jnp.exp(log_r0 - mx) + jnp.sum(e, axis=1, keepdims=True)
        logz = mx + jnp.log(z)  # per-sequence marginal
        r = e / z  # (B, SLp) window responsibilities
        # rw3[b, m*Wp + j, i] = r[b, i - j]; rows j in W..Wp stay zero
        for j in range(W):
            rw3[:, m * Wp + j, :] = pltpu.roll(r, j, axis=1)
        stats_ref[0, 2 * m] += jnp.sum(logz)
        stats_ref[0, 2 * m + 1] += jnp.sum(r)

    def m_body(b, _):
        rw_b = rw3[pl.ds(b, 1), :, :].reshape(M * Wp, SLp)
        _mstep_row(
            _row_of(qcodes_ref, b), rw_b, C5_ref,
            M=M, Qhi=Qhi, Qlo=Qlo, QloP=QloP, Wp=Wp, SLp=SLp, stack=stack,
        )
        return 0

    def m_body_g(i, _):
        b0 = i * G
        codes_g = jnp.concatenate(
            [_row_of(qcodes_ref, b0 + g) for g in range(G)], axis=1
        )
        rw_g = jnp.concatenate(
            [
                rw3[pl.ds(b0 + g, 1), :, :].reshape(M * Wp, SLp)
                for g in range(G)
            ],
            axis=1,
        )  # (M*Wp, G*SLp)
        _mstep_row(
            codes_g, rw_g, C5_ref,
            M=M, Qhi=Qhi, Qlo=Qlo, QloP=QloP, Wp=Wp, SLp=G * SLp,
            stack=stack,
        )
        return 0

    if Qhi == 1:
        for b in range(B):
            m_body(b, 0)
    elif G == 1:
        jax.lax.fori_loop(0, B, m_body, 0, unroll=HI_UNROLL)
    else:
        jax.lax.fori_loop(0, B // G, m_body_g, 0, unroll=HI_UNROLL)


def _prep(cidx, lens, g):
    """Shared block layout: (n_blocks, B, SLp) codes + per-block lens."""
    S, N, L = cidx.shape
    SLp, B = g["SLp"], g["B"]
    sentinel = g["Q"] - 1  # combined sentinel row R: zero score, counts dropped

    qn = jnp.moveaxis(cidx, 0, 1).reshape(N, S * L)
    qn = jnp.pad(qn, ((0, 0), (0, SLp - S * L)), constant_values=sentinel)
    pad = (-N) % B
    if pad:
        qn = jnp.concatenate(
            [qn, jnp.full((pad, SLp), sentinel, qn.dtype)], axis=0
        )
        if lens is not None:
            lens = jnp.concatenate([lens, jnp.zeros((pad,), lens.dtype)])
    n_blocks = qn.shape[0] // B
    qblk = qn.reshape(n_blocks, B, SLp).astype(jnp.int32)
    lens_blk = (
        lens.astype(jnp.float32).reshape(n_blocks, B, 1)
        if lens is not None
        else None
    )
    # static lane -> in-sequence position map (strand-major, pads huge)
    ipos = np.concatenate(
        [np.tile(np.arange(L, dtype=np.int32), S),
         np.full(SLp - S * L, 1 << 28, np.int32)]
    ).reshape(1, SLp)
    return qblk, lens_blk, jnp.asarray(ipos), pad, n_blocks


def _term_stacked_lut(s_flat3, W, g):
    """[M, Q, W] f32 LUTs -> (QloP, NT_SCORES * M*Qhi*Wp) bf16 term stack.

    Column = t*Wt + (m*Qhi + h)*Wp + j holds bf16 residual term t of
    s_flat3[m, h*Qlo + l, j] at row l (sum of the NT_SCORES terms == the
    f32 value exactly).  Rows Q..Qhi*Qlo-1 of each seed are padding no
    code ever indexes (zero score, zero counts); precomputing the term
    split here keeps it out of the kernel's per-row loop entirely.
    """
    Q, Qlo, Qhi, Wp = g["Q"], g["Qlo"], g["Qhi"], g["Wp"]
    QloP, M = g["QloP"], g["M"]
    s = jnp.pad(s_flat3, ((0, 0), (0, Qhi * Qlo - Q), (0, Wp - W)))
    sg = s.reshape(M, Qhi, Qlo, Wp).transpose(2, 0, 1, 3).reshape(
        Qlo, M * Qhi * Wp
    )
    sg = jnp.pad(sg, ((0, QloP - Qlo), (0, 0))).astype(jnp.float32)
    return jnp.concatenate(_split_terms_xla(sg, NT_SCORES), axis=1)


def _ungroup_counts(Cg, W, g):
    """(QloP, M*Qhi*Wp) kernel counts -> [M, Q, W] combined count rows."""
    Q, Qlo, Qhi, Wp, M = g["Q"], g["Qlo"], g["Qhi"], g["Wp"], g["M"]
    C = Cg[:Qlo].reshape(Qlo, M, Qhi, Wp).transpose(1, 2, 0, 3).reshape(
        M, Qhi * Qlo, Wp
    )
    return C[:, :Q, :W]


@functools.partial(jax.jit, static_argnames=("A", "K", "W", "R", "interpret"))
def em_counts_multi(
    s_flat: jnp.ndarray,
    cidx: jnp.ndarray,
    lens: jnp.ndarray,
    q: jnp.ndarray,
    *,
    A: int,
    K: int,
    W: int,
    R: int,
    interpret: bool = False,
):
    """Seed-stacked fused E+M data pass: M seeds share every one-hot.

    One kernel invocation scores and counts ALL M seeds against the same
    sequence block — the M LUTs stack along the E/M matmuls' output rows
    (M*NT*Wp instead of NT*Wp), filling the MXU that a single W=12 seed
    structurally cannot (docs/PERFORMANCE.md roofline: 48/128 output rows
    per seed).  TPU-native form of the reference's OpenMP-over-motifs
    (SURVEY.md 3.1; BASELINE config 4 "top-10 PEnG seeds in parallel").
    VMEM bounds M — callers chunk the seed axis to ``max_seeds``.

    Args:
      s_flat: [M, R+1, W] combined log-odds LUTs (one per seed).
      cidx: [S, N, L] combined-row codes (encode.strand_indices).
      lens: [N] int32.
      q: [M] per-seed ZOOPS priors.

    Returns (C [M, R+1, W] combined fractional counts, ll [M]).
    """
    M = s_flat.shape[0]
    S, N, L = cidx.shape
    g = _geometry(A, K, W, S, L, M)
    qblk, lens_blk, ipos, pad, n_blocks = _prep(cidx, lens, g)
    Qhi, QloP, Wp, SLp, B = g["Qhi"], g["QloP"], g["Wp"], g["SLp"], g["B"]
    Wt = g["Wt"]
    s5t = _term_stacked_lut(s_flat, W, g)
    SP = max(8, 2 * M)

    kernel = functools.partial(
        _kernel, B=B, S=S, W=W, SLp=SLp,
        Qlo=g["Qlo"], Qhi=Qhi, QloP=QloP, Wp=Wp, M=M, SP=SP,
        stack=g["stack_terms"], G=g["G"],
    )
    C5g, stats = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, M), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, B, SLp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((QloP, NT_SCORES * Wt), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SLp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((QloP, Wt), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SP), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((QloP, Wt), jnp.float32),
            jax.ShapeDtypeStruct((1, SP), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, M * Wp, SLp), jnp.float32),
            pltpu.VMEM((B, M * Wp, SLp), jnp.float32),
        ],
        interpret=interpret,
    )(
        jnp.asarray(q, jnp.float32).reshape(1, M),
        qblk,
        lens_blk,
        s5t,
        ipos,
    )

    C = _ungroup_counts(C5g, W, g)  # [M, R+1, W] — combined rows directly
    # zero-length block-pad rows each contribute exactly log(1-q_m)
    ll = stats[0, 0 : 2 * M : 2] - jnp.float32(pad) * jnp.log1p(
        -jnp.asarray(q, jnp.float32)
    )
    return C, ll


def em_counts(
    s_flat: jnp.ndarray,
    cidx: jnp.ndarray,
    lens: jnp.ndarray,
    q,
    *,
    A: int,
    K: int,
    W: int,
    R: int,
    interpret: bool = False,
):
    """Fused E+M data pass for ONE seed (em_counts_multi with M=1).

    Args:
      s_flat: [R+1, W] combined log-odds LUT.
      cidx: [S, N, L] combined-row codes (encode.strand_indices).
      lens: [N] int32.
      q: scalar ZOOPS prior.

    Returns (C [R+1, W] combined fractional counts, ll scalar).
    """
    C, ll = em_counts_multi(
        s_flat[None],
        cidx,
        lens,
        jnp.reshape(jnp.asarray(q, jnp.float32), (1,)),
        A=A, K=K, W=W, R=R, interpret=interpret,
    )
    return C[0], ll[0]


def _counts_kernel(
    qcodes_ref, r_ref, C5_ref, rw3,
    *, B, W, SLp, Qlo, Qhi, QloP, Wp, M, stack, G,
):
    """M-step-only variant: counts from EXTERNAL responsibilities.

    Used by collapsed Gibbs sampling, whose hard 0/1 occupancy tensor is
    produced by the sampler (z ~ Categorical) rather than the in-kernel
    posterior; scores come from _scores_kernel, counts land here instead
    of the XLA segment-sum scatter (~100x slower on TPU).  Seed-stacked
    like _kernel: r_ref row m*B + b is seed m's responsibilities for
    block sequence b, and all M seeds share each one-hot.
    """
    @pl.when(pl.program_id(0) == 0)
    def _():
        C5_ref[:] = jnp.zeros_like(C5_ref)
        rw3[:] = jnp.zeros_like(rw3)

    for m in range(M):
        r = r_ref[0, pl.ds(m * B, B), :]  # (B, SLp) f32
        for j in range(W):
            rw3[:, m * Wp + j, :] = pltpu.roll(r, j, axis=1)

    def m_body(b, _):
        rw_b = rw3[pl.ds(b, 1), :, :].reshape(M * Wp, SLp)
        _mstep_row(
            _row_of(qcodes_ref, b), rw_b, C5_ref,
            M=M, Qhi=Qhi, Qlo=Qlo, QloP=QloP, Wp=Wp, SLp=SLp, stack=stack,
        )
        return 0

    def m_body_g(i, _):
        b0 = i * G
        codes_g = jnp.concatenate(
            [_row_of(qcodes_ref, b0 + g) for g in range(G)], axis=1
        )
        rw_g = jnp.concatenate(
            [
                rw3[pl.ds(b0 + g, 1), :, :].reshape(M * Wp, SLp)
                for g in range(G)
            ],
            axis=1,
        )
        _mstep_row(
            codes_g, rw_g, C5_ref,
            M=M, Qhi=Qhi, Qlo=Qlo, QloP=QloP, Wp=Wp, SLp=G * SLp,
            stack=stack,
        )
        return 0

    if Qhi == 1:  # unroll/loop trade-off: see _kernel
        for b in range(B):
            m_body(b, 0)
    elif G == 1:
        jax.lax.fori_loop(0, B, m_body, 0, unroll=HI_UNROLL)
    else:
        jax.lax.fori_loop(0, B // G, m_body_g, 0, unroll=HI_UNROLL)


@functools.partial(jax.jit, static_argnames=("A", "K", "W", "R", "interpret"))
def counts_from_r_multi(
    r_msnl: jnp.ndarray,
    cidx: jnp.ndarray,
    *,
    A: int,
    K: int,
    W: int,
    R: int,
    interpret: bool = False,
):
    """Seed-stacked M-step counts from explicit responsibility tensors.

    Args:
      r_msnl: [M, S, N, L] per-seed window responsibilities laid out like
        cidx (zero on invalid/pad positions and beyond each sequence's
        window frontier).
      cidx: [S, N, L] combined-row codes (shared by all seeds).

    Returns C: f32 [M, R+1, W].  One kernel counts every seed — the M
    responsibility planes ride the counts matmul's output rows against
    one shared one-hot per sequence row (cf. em_counts_multi).  Groups
    beyond the VMEM-bounded ``max_seeds`` split into balanced chunks
    (the stacked transients grow linearly in M, x Qhi at high K).
    """
    M = r_msnl.shape[0]
    S, N, L = cidx.shape
    Mc = max_seeds(K, W, A=A, S=S, L=L)
    if M > Mc:
        n_chunks = -(-M // Mc)
        size = -(-M // n_chunks)
        return jnp.concatenate([
            counts_from_r_multi(
                r_msnl[i0 : i0 + size], cidx,
                A=A, K=K, W=W, R=R, interpret=interpret,
            )
            for i0 in range(0, M, size)
        ])
    g = _geometry(A, K, W, S, L, M)
    qblk, _, _, pad, n_blocks = _prep(cidx, None, g)
    Qhi, QloP, Wp, SLp, B = g["Qhi"], g["QloP"], g["Wp"], g["SLp"], g["B"]

    # per-seed responsibilities through the (n_blocks, M*B, SLp) layout
    # (row m*B + b = seed m, block sequence b), pad 0
    rn = jnp.moveaxis(r_msnl, 1, 2).reshape(M, N, S * L)
    rn = jnp.pad(rn, ((0, 0), (0, pad), (0, SLp - S * L)))
    rblk = (
        rn.reshape(M, n_blocks, B, SLp)
        .transpose(1, 0, 2, 3)
        .reshape(n_blocks, M * B, SLp)
        .astype(jnp.float32)
    )

    kernel = functools.partial(
        _counts_kernel, B=B, W=W, SLp=SLp,
        Qlo=g["Qlo"], Qhi=Qhi, QloP=QloP, Wp=Wp, M=M, stack=g["stack_terms"],
        G=g["G"],
    )
    C5g, = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, B, SLp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M * B, SLp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((QloP, g["Wt"]), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((QloP, g["Wt"]), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((B, M * Wp, SLp), jnp.float32)],
        interpret=interpret,
    )(qblk, rblk)

    return _ungroup_counts(C5g, W, g)  # [M, R+1, W]


def counts_from_r(
    r_snl: jnp.ndarray,
    cidx: jnp.ndarray,
    *,
    A: int,
    K: int,
    W: int,
    R: int,
    interpret: bool = False,
):
    """M-step counts for ONE responsibility tensor (counts_from_r_multi
    with M=1).

    Args:
      r_snl: [S, N, L] window responsibilities laid out like cidx (zero on
        invalid/pad positions and beyond each sequence's window frontier).
      cidx: [S, N, L] combined-row codes.

    Returns C: f32 [R+1, W] combined fractional counts (same contract as
    ops.escore.mstep_counts).
    """
    return counts_from_r_multi(
        r_snl[None], cidx, A=A, K=K, W=W, R=R, interpret=interpret
    )[0]


def _scores_kernel(
    qcodes_ref, s5t_ref, sc_ref, P3,
    *, B, W, SLp, Qlo, Qhi, QloP, Wp, M, stack, G,
):
    """Scores-only variant of _kernel: window log-odds, no posterior.

    Seed-stacked: sc_ref row m*B + b carries seed m's window scores for
    block sequence b."""

    def e_body(b, _):
        P = _escore_row(
            _row_of(qcodes_ref, b), s5t_ref,
            M=M, Qhi=Qhi, Qlo=Qlo, QloP=QloP, Wp=Wp, SLp=SLp, stack=stack,
        )
        P3[pl.ds(b, 1), :, :] = P.reshape(1, M * Wp, SLp)
        return 0

    def e_body_g(i, _):
        b0 = i * G
        codes_g = jnp.concatenate(
            [_row_of(qcodes_ref, b0 + g) for g in range(G)], axis=1
        )
        P = _escore_row(
            codes_g, s5t_ref,
            M=M, Qhi=Qhi, Qlo=Qlo, QloP=QloP, Wp=Wp, SLp=G * SLp,
            stack=stack,
        )
        for g in range(G):
            P3[pl.ds(b0 + g, 1), :, :] = P[
                :, g * SLp : (g + 1) * SLp
            ].reshape(1, M * Wp, SLp)
        return 0

    if Qhi == 1:  # unroll/loop trade-off: see _kernel
        for b in range(B):
            e_body(b, 0)
    elif G == 1:
        jax.lax.fori_loop(0, B, e_body, 0, unroll=HI_UNROLL)
    else:
        jax.lax.fori_loop(0, B // G, e_body_g, 0, unroll=HI_UNROLL)
    for m in range(M):
        sc = P3[:, m * Wp, :]
        for j in range(1, W):
            sc = sc + pltpu.roll(P3[:, m * Wp + j, :], (SLp - j) % SLp, axis=1)
        sc_ref[0, pl.ds(m * B, B), :] = sc


@functools.partial(jax.jit, static_argnames=("A", "K", "W", "interpret"))
def window_scores_multi(
    s_flat: jnp.ndarray,
    cidx: jnp.ndarray,
    lens: jnp.ndarray,
    *,
    A: int,
    K: int,
    W: int,
    interpret: bool = False,
):
    """Seed-stacked Pallas window scoring: M LUTs against one code pass.

    Args:
      s_flat: [M, R+1, W] combined log-odds LUTs.
      cidx: [S, N, L]; lens: [N].

    Returns (scores f32 [M, S, N, L-W+1] with NEG_INF on invalid windows,
    mask bool [N, L-W+1]).  Used by the batched CGS sweep (all seeds of a
    group share every one-hot) and anywhere several motifs scan the same
    set (cf. ScoreSeqSet::calcLogOdds per motif in the reference driver
    loop).
    """
    from bammmotif2_tpu.ops import escore

    M = s_flat.shape[0]
    S, N, L = cidx.shape
    Mc = max_seeds(K, W, A=A, S=S, L=L)
    if M > Mc:
        # balanced VMEM-bounded seed chunks (cf. em_counts_multi callers):
        # the term-stacked LUT and per-term transients grow linearly in M
        # (x Qhi at high K) and would blow VMEM for large scan groups
        n_chunks = -(-M // Mc)
        size = -(-M // n_chunks)
        parts = [
            window_scores_multi(
                s_flat[i0 : i0 + size], cidx, lens,
                A=A, K=K, W=W, interpret=interpret,
            )
            for i0 in range(0, M, size)
        ]
        return jnp.concatenate([p[0] for p in parts]), parts[0][1]
    g = _geometry(A, K, W, S, L, M)
    qblk, _, _, pad, n_blocks = _prep(cidx, None, g)
    Qhi, QloP, Wp, SLp, B = g["Qhi"], g["QloP"], g["Wp"], g["SLp"], g["B"]
    s5t = _term_stacked_lut(s_flat, W, g)

    kernel = functools.partial(
        _scores_kernel, B=B, W=W, SLp=SLp,
        Qlo=g["Qlo"], Qhi=Qhi, QloP=QloP, Wp=Wp, M=M, stack=g["stack_terms"],
        G=g["G"],
    )
    sc, = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, B, SLp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((QloP, NT_SCORES * g["Wt"]), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, M * B, SLp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((n_blocks, M * B, SLp), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((B, M * Wp, SLp), jnp.float32)],
        interpret=interpret,
    )(qblk, s5t)

    n_win = L - W + 1
    # row m*B + b of block i = seed m, sequence i*B + b; first S*L lanes
    # are strand-major [S, L]
    rows = (
        sc.reshape(n_blocks, M, B, SLp).transpose(1, 0, 2, 3)
        .reshape(M, n_blocks * B, SLp)[:, :N]
    )  # [M, N, SLp]
    sc_sl = rows[:, :, : S * L].reshape(M, N, S, L)
    scores = jnp.moveaxis(sc_sl, 2, 1)[:, :, :, :n_win]  # [M, S, N, n_win]
    mask = escore.window_mask(lens, n_win, W)
    return jnp.where(mask[None, None], scores, NEG_INF), mask


def window_scores(
    s_flat: jnp.ndarray,
    cidx: jnp.ndarray,
    lens: jnp.ndarray,
    *,
    A: int,
    K: int,
    W: int,
    interpret: bool = False,
):
    """Pallas window scoring (scanner hot path, ScoreSeqSet::calcLogOdds).

    Same contract as ops.escore.window_scores — returns
    (scores f32 [S, N, L-W+1] with NEG_INF on invalid windows,
    mask bool [N, L-W+1]) — but computed with the one-hot-matmul kernel:
    ~100x the gather path's throughput on a v5e.  window_scores_multi
    with M=1.
    """
    scores, mask = window_scores_multi(
        s_flat[None], cidx, lens, A=A, K=K, W=W, interpret=interpret
    )
    return scores[0], mask
