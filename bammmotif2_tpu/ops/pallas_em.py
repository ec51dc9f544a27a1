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
rounding of the posterior normalization either way.

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
MAX_B = 64  # larger blocks exceed v5e VMEM (2 scratch (B, Wp, SLp) tensors)
MAX_QHI = 128  # hi values resolved by VPU masked accumulation
_VMEM_BUDGET = 10 * 1024 * 1024  # bytes of in-kernel temporaries to aim for

NT_SCORES = 3  # bf16 split terms for the E-step matmul (3 == full f32)
NT_COUNTS = 2  # for the M-step matmul (posterior rounding dominates anyway)


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


def _block_seqs(SLp: int, Wp: int, fixed_bytes: int) -> int:
    """Sequences per block: two (B, Wp, SLp) f32 scratches plus ~8 (B, SLp)
    f32 row temporaries, on top of the fixed per-block tensors (one-hot,
    V/RH scratch, LUT)."""
    per_seq = SLp * (8 * Wp + 32)
    avail = max(_VMEM_BUDGET - fixed_bytes, per_seq)
    return max(1, min(MAX_B, avail // per_seq))


def _split_terms(x, n):
    """x (f32) == sum of n bf16 residual terms (exact for n >= 3)."""
    terms = []
    r = x
    for i in range(n):
        t = r.astype(jnp.bfloat16)
        terms.append(t)
        if i + 1 < n:
            r = r - t.astype(jnp.float32)
    return terms


def _split_dot(other_f32, exact_bf16, dims, nterms):
    """dot_general(other, exact) with f32 accumulation; ``exact`` must be
    exactly representable in bf16 (a 0/1 one-hot here)."""
    out = None
    for t in _split_terms(other_f32, nterms):
        p = jax.lax.dot_general(
            t, exact_bf16, dims, preferred_element_type=jnp.float32
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


def _escore_row(codes_row, s5_ref, *, Qhi, Qlo, QloP, W, Wp, SLp):
    """E-step scores for one (1, SLp) code row: (Wp, SLp) position scores.

    s5_ref holds the LUT regrouped as (QloP, Qhi*Wp):
    s5g[l, h*Wp + j] = s5[h*Qlo + l, j].
    """
    lo = jax.lax.rem(codes_row, Qlo) if Qhi > 1 else codes_row
    oh_lo = _onehot_row(lo, QloP, SLp)
    V = _split_dot(s5_ref[:], oh_lo, (((0,), (0,)), ((), ())), NT_SCORES)
    if Qhi == 1:
        return V  # (Wp, SLp)
    hi = jax.lax.div(codes_row, Qlo)  # (1, SLp)
    P = jnp.zeros((Wp, SLp), jnp.float32)
    for h in range(Qhi):
        mask_h = (hi == h).astype(jnp.float32)  # (1, SLp)
        P = P + V[h * Wp : (h + 1) * Wp, :] * mask_h
    return P


def _mstep_row(codes_row, rw_b, C5_ref, *, Qhi, Qlo, QloP, Wp, SLp):
    """Accumulate counts for one row: C5_ref (QloP, Qhi*Wp) += oh_lo @ RH^T
    where RH[h*Wp + j, i] = rw_b[j, i] * [c_hi == h]."""
    lo = jax.lax.rem(codes_row, Qlo) if Qhi > 1 else codes_row
    oh_lo = _onehot_row(lo, QloP, SLp)
    if Qhi == 1:
        RH = rw_b  # (Wp, SLp)
    else:
        hi = jax.lax.div(codes_row, Qlo)
        parts = []
        for h in range(Qhi):
            mask_h = (hi == h).astype(jnp.float32)
            parts.append(rw_b * mask_h)
        RH = jnp.concatenate(parts, axis=0)  # (Qhi*Wp, SLp)
    C5_ref[:] += _split_dot(RH, oh_lo, (((1,), (1,)), ((), ())), NT_COUNTS).T


def _kernel(
    q_ref, qcodes_ref, lens_ref, s5_ref, ipos_ref,
    C5_ref, stats_ref, P3, rw3,
    *, B, S, W, SLp, Qlo, Qhi, QloP, Wp,
):
    @pl.when(pl.program_id(0) == 0)
    def _():
        C5_ref[:] = jnp.zeros_like(C5_ref)
        rw3[:] = jnp.zeros_like(rw3)
        # SMEM accepts only scalar stores — initialize element-wise
        stats_ref[0, 0] = 0.0
        stats_ref[0, 1] = 0.0

    q = q_ref[0, 0]
    log_r0 = jnp.log1p(-q)

    # E-step scores per row: P3[b, j, i] = s5[code[b, i], j].
    # Qhi == 1 (K <= 2 at A=4): Python-unrolled — Mosaic pipelines the per-row
    # matmuls (2.4x the fori_loop's throughput) and the per-row temporaries
    # are small enough to stack.  Qhi > 1: fori_loop — the hi/lo masked
    # temporaries are ~10x larger and an unrolled stack overflows VMEM.
    def e_body(b, _):
        P = _escore_row(
            _row_of(qcodes_ref, b), s5_ref,
            Qhi=Qhi, Qlo=Qlo, QloP=QloP, W=W, Wp=Wp, SLp=SLp,
        )
        P3[pl.ds(b, 1), :, :] = P.reshape(1, Wp, SLp)
        return 0

    if Qhi == 1:
        for b in range(B):
            e_body(b, 0)
    else:
        jax.lax.fori_loop(0, B, e_body, 0)

    # window scores sc[b, i] = sum_j P3[b, j, i + j]; lane rolls wrap within
    # the row, which is harmless: wrapped windows fail the i + W <= len mask
    sc = P3[:, 0, :]  # (B, SLp)
    for j in range(1, W):
        sc = sc + pltpu.roll(P3[:, j, :], (SLp - j) % SLp, axis=1)

    # ZOOPS posterior — all (B, 1)-vs-(B, SLp) row ops
    lens = lens_ref[0]  # (B, 1) f32
    nwin = S * jnp.maximum(lens - (W - 1), 0.0)
    log_prior = jnp.where(
        nwin > 0, jnp.log(q) - jnp.log(jnp.maximum(nwin, 1.0)), NEG_INF
    )  # (B, 1)
    ipos = ipos_ref[:].astype(jnp.float32)  # (1, SLp); huge on pad lanes
    mask = (ipos + W) <= lens  # (B, SLp)
    logw = jnp.where(mask, sc + log_prior, NEG_INF)

    m = jnp.maximum(jnp.max(logw, axis=1, keepdims=True), log_r0)  # (B, 1)
    e = jnp.where(mask, jnp.exp(logw - m), 0.0)
    z = jnp.exp(log_r0 - m) + jnp.sum(e, axis=1, keepdims=True)  # (B, 1)
    logz = m + jnp.log(z)  # per-sequence marginal
    r = e / z  # (B, SLp) window responsibilities

    # M-step: rw3[b, j, i] = r[b, i - j]; rows W..Wp stay zero
    for j in range(W):
        rw3[:, j, :] = pltpu.roll(r, j, axis=1)

    def m_body(b, _):
        rw_b = rw3[pl.ds(b, 1), :, :].reshape(Wp, SLp)
        _mstep_row(
            _row_of(qcodes_ref, b), rw_b, C5_ref,
            Qhi=Qhi, Qlo=Qlo, QloP=QloP, Wp=Wp, SLp=SLp,
        )
        return 0

    if Qhi == 1:
        for b in range(B):
            m_body(b, 0)
    else:
        jax.lax.fori_loop(0, B, m_body, 0)

    stats_ref[0, 0] += jnp.sum(logz)
    stats_ref[0, 1] += jnp.sum(r)


def _geometry(A, K, W, S, L):
    Q = encode.num_rows(A, K) + 1  # combined rows + sentinel
    Qlo, Qhi = _hi_lo(K, A)
    QloP = _round_up(Qlo, LANE)
    Wp = _round_up(W, SUBLANE)
    SLp = _round_up(S * L, LANE)
    # fixed per-block VMEM: low one-hot (bf16) + V/RH scratch + regrouped LUT
    fixed = QloP * SLp * 2 + 2 * (Qhi * Wp) * SLp * 4 + QloP * (Qhi * Wp) * 4
    B = _block_seqs(SLp, Wp, fixed)
    return dict(Q=Q, Qlo=Qlo, Qhi=Qhi, QloP=QloP, Wp=Wp, SLp=SLp, B=B)


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


def _grouped_lut(s_flat, W, g):
    """Combined LUT regrouped by (lo, hi*W): sg[l, h*Wp + j] = s[h*Qlo+l, j].

    s_flat has Q = R+1 rows; rows Q..Qhi*Qlo-1 are padding no code ever
    indexes (zero score, zero counts)."""
    Q, Qlo, Qhi, QloP, Wp = g["Q"], g["Qlo"], g["Qhi"], g["QloP"], g["Wp"]
    s = jnp.pad(s_flat, ((0, Qhi * Qlo - Q), (0, Wp - W)))  # [Qhi*Qlo, Wp]
    sg = s.reshape(Qhi, Qlo, Wp).transpose(1, 0, 2).reshape(Qlo, Qhi * Wp)
    return jnp.pad(sg, ((0, QloP - Qlo), (0, 0))).astype(jnp.float32)


def _ungroup_counts(Cg, W, g):
    """(QloP, Qhi*Wp) kernel counts -> (Q, W) combined count rows."""
    Q, Qlo, Qhi, Wp = g["Q"], g["Qlo"], g["Qhi"], g["Wp"]
    C = Cg[:Qlo].reshape(Qlo, Qhi, Wp).transpose(1, 0, 2).reshape(
        Qhi * Qlo, Wp
    )
    return C[:Q, :W]


@functools.partial(jax.jit, static_argnames=("A", "K", "W", "R", "interpret"))
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
    """Fused E+M data pass.

    Args:
      s_flat: [R+1, W] combined log-odds LUT.
      cidx: [S, N, L] combined-row codes (encode.strand_indices).
      lens: [N] int32.
      q: scalar ZOOPS prior.

    Returns (C [R+1, W] combined fractional counts, ll scalar).
    """
    S, N, L = cidx.shape
    g = _geometry(A, K, W, S, L)
    qblk, lens_blk, ipos, pad, n_blocks = _prep(cidx, lens, g)
    Qhi, QloP, Wp, SLp, B = g["Qhi"], g["QloP"], g["Wp"], g["SLp"], g["B"]
    s5g = _grouped_lut(s_flat, W, g)

    kernel = functools.partial(
        _kernel, B=B, S=S, W=W, SLp=SLp,
        Qlo=g["Qlo"], Qhi=Qhi, QloP=QloP, Wp=Wp,
    )
    C5g, stats = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, B, SLp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((QloP, Qhi * Wp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SLp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((QloP, Qhi * Wp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((QloP, Qhi * Wp), jnp.float32),
            jax.ShapeDtypeStruct((1, 8), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, Wp, SLp), jnp.float32),
            pltpu.VMEM((B, Wp, SLp), jnp.float32),
        ],
        interpret=interpret,
    )(
        jnp.asarray(q, jnp.float32).reshape(1, 1),
        qblk,
        lens_blk,
        s5g,
        ipos,
    )

    C = _ungroup_counts(C5g, W, g)  # (R+1, W) — combined rows directly
    ll = stats[0, 0] - jnp.float32(pad) * jnp.log1p(
        -jnp.asarray(q, jnp.float32)
    )
    return C, ll


def _counts_kernel(
    qcodes_ref, r_ref, C5_ref, rw3,
    *, B, W, SLp, Qlo, Qhi, QloP, Wp,
):
    """M-step-only variant: counts from EXTERNAL responsibilities.

    Used by collapsed Gibbs sampling, whose hard 0/1 occupancy tensor is
    produced by the sampler (z ~ Categorical) rather than the in-kernel
    posterior; scores come from _scores_kernel, counts land here instead
    of the XLA segment-sum scatter (~100x slower on TPU).
    """
    @pl.when(pl.program_id(0) == 0)
    def _():
        C5_ref[:] = jnp.zeros_like(C5_ref)
        rw3[:] = jnp.zeros_like(rw3)

    r = r_ref[0]  # (B, SLp) f32
    for j in range(W):
        rw3[:, j, :] = pltpu.roll(r, j, axis=1)

    def m_body(b, _):
        rw_b = rw3[pl.ds(b, 1), :, :].reshape(Wp, SLp)
        _mstep_row(
            _row_of(qcodes_ref, b), rw_b, C5_ref,
            Qhi=Qhi, Qlo=Qlo, QloP=QloP, Wp=Wp, SLp=SLp,
        )
        return 0

    if Qhi == 1:  # unroll/loop trade-off: see _kernel
        for b in range(B):
            m_body(b, 0)
    else:
        jax.lax.fori_loop(0, B, m_body, 0)


@functools.partial(jax.jit, static_argnames=("A", "K", "W", "R", "interpret"))
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
    """M-step counts from an explicit responsibility tensor.

    Args:
      r_snl: [S, N, L] window responsibilities laid out like cidx (zero on
        invalid/pad positions and beyond each sequence's window frontier).
      cidx: [S, N, L] combined-row codes.

    Returns C: f32 [R+1, W] combined fractional counts (same contract as
    ops.escore.mstep_counts).
    """
    S, N, L = cidx.shape
    g = _geometry(A, K, W, S, L)
    qblk, _, _, pad, n_blocks = _prep(cidx, None, g)
    Qhi, QloP, Wp, SLp, B = g["Qhi"], g["QloP"], g["Wp"], g["SLp"], g["B"]

    # responsibilities through the same (n_blocks, B, SLp) layout, pad 0
    rn = jnp.moveaxis(r_snl, 0, 1).reshape(N, S * L)
    rn = jnp.pad(rn, ((0, 0), (0, SLp - S * L)))
    if pad:
        rn = jnp.concatenate([rn, jnp.zeros((pad, SLp), rn.dtype)], axis=0)
    rblk = rn.reshape(n_blocks, B, SLp).astype(jnp.float32)

    kernel = functools.partial(
        _counts_kernel, B=B, W=W, SLp=SLp,
        Qlo=g["Qlo"], Qhi=Qhi, QloP=QloP, Wp=Wp,
    )
    C5g, = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, B, SLp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, SLp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((QloP, Qhi * Wp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((QloP, Qhi * Wp), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((B, Wp, SLp), jnp.float32)],
        interpret=interpret,
    )(qblk, rblk)

    return _ungroup_counts(C5g, W, g)  # (R+1, W)


def _scores_kernel(
    qcodes_ref, s5_ref, sc_ref, P3,
    *, B, W, SLp, Qlo, Qhi, QloP, Wp,
):
    """Scores-only variant of _kernel: window log-odds, no posterior."""

    def e_body(b, _):
        P = _escore_row(
            _row_of(qcodes_ref, b), s5_ref,
            Qhi=Qhi, Qlo=Qlo, QloP=QloP, W=W, Wp=Wp, SLp=SLp,
        )
        P3[pl.ds(b, 1), :, :] = P.reshape(1, Wp, SLp)
        return 0

    if Qhi == 1:  # unroll/loop trade-off: see _kernel
        for b in range(B):
            e_body(b, 0)
    else:
        jax.lax.fori_loop(0, B, e_body, 0)
    sc = P3[:, 0, :]
    for j in range(1, W):
        sc = sc + pltpu.roll(P3[:, j, :], (SLp - j) % SLp, axis=1)
    sc_ref[0] = sc


@functools.partial(jax.jit, static_argnames=("A", "K", "W", "interpret"))
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
    ~100x the gather path's throughput on a v5e.
    """
    from bammmotif2_tpu.ops import escore

    S, N, L = cidx.shape
    g = _geometry(A, K, W, S, L)
    qblk, _, _, pad, n_blocks = _prep(cidx, None, g)
    Qhi, QloP, Wp, SLp, B = g["Qhi"], g["QloP"], g["Wp"], g["SLp"], g["B"]
    s5g = _grouped_lut(s_flat, W, g)

    kernel = functools.partial(
        _scores_kernel, B=B, W=W, SLp=SLp,
        Qlo=g["Qlo"], Qhi=Qhi, QloP=QloP, Wp=Wp,
    )
    sc, = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, B, SLp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((QloP, Qhi * Wp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, B, SLp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((n_blocks, B, SLp), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((B, Wp, SLp), jnp.float32)],
        interpret=interpret,
    )(qblk, s5g)

    n_win = L - W + 1
    # each row's first S*L lanes are strand-major [S, L]
    rows = sc.reshape(n_blocks * B, SLp)[:N]       # [N, SLp]
    sc_sl = rows[:, : S * L].reshape(N, S, L)      # [N, S, L]
    scores = jnp.moveaxis(sc_sl, 1, 0)[:, :, :n_win]  # [S, N, n_win]
    mask = escore.window_mask(lens, n_win, W)
    return jnp.where(mask[None], scores, NEG_INF), mask
