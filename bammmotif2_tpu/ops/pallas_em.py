"""Fused Pallas TPU kernel for one EM iteration's data pass.

The XLA fallback (ops.escore) walks HBM four times per iteration (gather
scores, normalize, materialize responsibilities, scatter counts) and the
arbitrary-index gather/scatter ops serialize badly on TPU (~380 ms each on
a v5e for the 10k x 200 bp order-2 benchmark).  This kernel does the whole
pass in ONE sweep over the sequence data with zero gathers/scatters.

Layout: everything lives in a TRANSPOSED 2-D form whose LANE axis is the
flattened position index t = (seq_in_block * SLp + strand * L + i), where
SLp = S*L rounded up to a lane multiple.  That makes every step a
Mosaic-legal op — no shape casts anywhere:

  * Indexing is lifted to the base-(A+1) code space (ops.encode.
    base5_kmer_index): symbol A = "no base" (boundary/ambiguous).  A static
    map (map_base5_to_combined) relates codes to combined-LUT rows, so the
    per-iteration score table ``s5[c] = s_flat[map5[c]]`` is a tiny gather
    of <= (A+1)^(K+1) rows done outside the kernel.
  * The transposed one-hot ``oh[c, t] = (code[t] == c)`` is an iota
    compare built IN VMEM (never touches HBM).
  * E-step scores  P = s5^T @ oh            -> [Wp, T]   (MXU)
  * Window scores  sc[t] = sum_j P[j, t+j]  -> W lane-rolls (VPU)
  * ZOOPS posterior: per-sequence logsumexp via a lane roll-tournament max
    over each sequence's SLp-aligned lane segment plus two tiny matmuls
    against static 0/1 segment matrices (broadcast/reduce by segment).
  * M-step counts  C5 += oh @ Rw^T where Rw[j, t] = r[t-j] (W lane-rolls
    into a VMEM scratch)                     -> [Qp, Wp]  (MXU)

HBM traffic per iteration ~= one read of the int32 code tensor.  Counts
return in the base-(A+1) space and are folded to combined rows with one
tiny segment-sum.  Supported for K <= 3 ((A+1)^(K+1) <= 640); higher
orders use the XLA path.

Parity: produces bitwise-equivalent-to-tolerance counts/likelihood vs
ops.escore (asserted in tests/test_pallas_em.py and on-device).
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
_VMEM_BUDGET = 10 * 1024 * 1024  # bytes of in-kernel temporaries to aim for


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def supported(K: int, A: int = 4) -> bool:
    return (A + 1) ** (K + 1) <= 640


def _block_seqs(SLp: int, Qp: int) -> int:
    """Sequences per block: fit ~6 [Qp/Wp, T] f32 temporaries in budget
    (oh, P, rw scratch, and the f32-precision matmul passes' operands)."""
    per_seq = 6 * max(Qp, LANE) * SLp * 4
    return max(1, min(64, _VMEM_BUDGET // per_seq))


def _kernel(
    q_ref, qcodes_ref, lens_ref, s5_ref, ipos_ref, seg_ref, sel_ref,
    C5_ref, stats_ref, rw_scratch,
    *, B, S, L, W, T, SLp, Qp, Wp,
):
    @pl.when(pl.program_id(0) == 0)
    def _():
        C5_ref[:] = jnp.zeros_like(C5_ref)
        rw_scratch[:] = jnp.zeros_like(rw_scratch)
        # SMEM accepts only scalar stores — initialize element-wise
        stats_ref[0, 0] = 0.0
        stats_ref[0, 1] = 0.0

    q = q_ref[0, 0]
    log_r0 = jnp.log1p(-q)
    codes = qcodes_ref[0]  # (1, T) int32 — block (1, 1, T), leading grid dim
    seg = seg_ref[:]       # (B, T) f32: seg[b, t] = 1 iff t in seq b's lanes
    sel = sel_ref[:]       # (T, B) f32: sel[t, b] = 1 iff t == b * SLp

    # transposed one-hot, VMEM-only
    oh = (
        jax.lax.broadcasted_iota(jnp.int32, (Qp, T), 0)
        == jnp.broadcast_to(codes, (Qp, T))
    ).astype(jnp.float32)

    # E-step scores: P[j, t] = s5[code[t], j]
    P = jax.lax.dot_general(
        s5_ref[:], oh, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (Wp, T)

    # window scores sc[t] = sum_j P[j, t + j]
    sc = P[0:1, :]
    for j in range(1, W):
        sc = sc + pltpu.roll(P[j : j + 1, :], (T - j) % T, axis=1)

    # per-sequence prior and window mask
    lens = lens_ref[0]  # (1, B) f32 — block (1, 1, B)
    nwin = S * jnp.maximum(lens - (W - 1), 0.0)
    log_prior_b = jnp.where(
        nwin > 0, jnp.log(q) - jnp.log(jnp.maximum(nwin, 1.0)), NEG_INF
    )  # (1, B)
    lenvec = jax.lax.dot_general(
        lens, seg, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST
    )  # (1, T)
    priorvec = jax.lax.dot_general(
        log_prior_b, seg, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (1, T)
    ipos = ipos_ref[:].astype(jnp.float32)  # (1, T); huge on pad lanes
    mask = (ipos + W) <= lenvec
    logw = jnp.where(mask, sc + priorvec, NEG_INF)  # (1, T)

    # segment max over each SLp-lane run: roll-tournament doubling; only
    # lanes t = b*SLp are consumed (via sel), so circular wrap is harmless.
    mt = logw
    p = 1
    while p * 2 <= SLp:
        mt = jnp.maximum(mt, pltpu.roll(mt, (T - p) % T, axis=1))
        p *= 2
    if p < SLp:
        mt = jnp.maximum(mt, pltpu.roll(mt, (T - (SLp - p)) % T, axis=1))
    mrow = jax.lax.dot_general(
        mt, sel, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST
    )  # (1, B) — per-sequence max window log-weight
    m = jnp.maximum(mrow, log_r0)

    mvec = jax.lax.dot_general(
        m, seg, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST
    )  # (1, T)
    e = jnp.where(mask, jnp.exp(logw - mvec), 0.0)
    zrow = jax.lax.dot_general(
        e, seg, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST
    )  # (1, B)
    z = jnp.exp(log_r0 - m) + zrow
    logz = m + jnp.log(z)  # (1, B) per-sequence marginal
    logzvec = jax.lax.dot_general(
        logz, seg, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST
    )  # (1, T)
    r = jnp.where(mask, jnp.exp(logw - logzvec), 0.0)  # (1, T)

    # M-step: rw_scratch[j, t] = r[t - j]; rows W..Wp stay zero
    for j in range(W):
        rw_scratch[j : j + 1, :] = pltpu.roll(r, j, axis=1)
    C5_ref[:] += jax.lax.dot_general(
        oh, rw_scratch[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (Qp, Wp)

    stats_ref[0, 0] += jnp.sum(logz)
    stats_ref[0, 1] += jnp.sum(r)


@functools.partial(jax.jit, static_argnames=("A", "K", "W", "R", "interpret"))
def em_counts(
    s_flat: jnp.ndarray,
    qidx: jnp.ndarray,
    lens: jnp.ndarray,
    q,
    map5: jnp.ndarray,
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
      qidx: [S, N, L] base-(A+1) codes (encode.strand_base5_indices).
      lens: [N] int32.
      q: scalar ZOOPS prior.
      map5: [(A+1)^(K+1)] int32 code -> combined row.

    Returns (C [R+1, W] combined fractional counts, ll scalar).
    """
    S, N, L = qidx.shape
    Q = (A + 1) ** (K + 1)
    Qp = _round_up(Q, LANE)
    Wp = _round_up(W, LANE)
    SLp = _round_up(S * L, LANE)
    B = _block_seqs(SLp, Qp)
    T = B * SLp
    sentinel = Q - 1  # all digits == A -> maps to the zero-score sentinel row

    s5 = s_flat[map5]  # [Q, W]
    s5 = jnp.pad(s5, ((0, Qp - Q), (0, Wp - W)))

    # [N, S*L] n-major position layout, lane-padded per sequence to SLp
    qn = jnp.moveaxis(qidx, 0, 1).reshape(N, S * L)
    qn = jnp.pad(qn, ((0, 0), (0, SLp - S * L)), constant_values=sentinel)
    pad = (-N) % B
    if pad:
        qn = jnp.concatenate(
            [qn, jnp.full((pad, SLp), sentinel, qn.dtype)], axis=0
        )
        lens = jnp.concatenate([lens, jnp.zeros((pad,), lens.dtype)])
    n_blocks = qn.shape[0] // B
    # grid-indexed inputs carry a leading block axis so the LAST TWO dims of
    # each block equal the array dims (Mosaic tiling requirement).
    qflat = qn.reshape(n_blocks, 1, T)
    lens_blk = lens.astype(jnp.float32).reshape(n_blocks, 1, B)

    # static per-block patterns
    ipos_1seq = np.concatenate(
        [np.tile(np.arange(L, dtype=np.int32), S),
         np.full(SLp - S * L, 1 << 28, np.int32)]
    )
    ipos = np.tile(ipos_1seq, B).reshape(1, T)
    tt = np.arange(T) // SLp  # sequence-in-block of each lane
    seg_np = (tt[None, :] == np.arange(B)[:, None]).astype(np.float32)
    sel_np = np.zeros((T, B), np.float32)
    sel_np[np.arange(B) * SLp, np.arange(B)] = 1.0

    kernel = functools.partial(
        _kernel, B=B, S=S, L=L, W=W, T=T, SLp=SLp, Qp=Qp, Wp=Wp
    )
    C5, stats = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, T), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, B), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Qp, Wp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, T), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, B), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((Qp, Wp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Qp, Wp), jnp.float32),
            jax.ShapeDtypeStruct((1, 8), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((Wp, T), jnp.float32)],
        interpret=interpret,
    )(
        jnp.asarray(q, jnp.float32).reshape(1, 1),
        qflat.astype(jnp.int32),
        lens_blk,
        s5.astype(jnp.float32),
        jnp.asarray(ipos),
        jnp.asarray(seg_np),
        jnp.asarray(sel_np),
    )

    C = jax.ops.segment_sum(C5[:Q, :W], map5, num_segments=R + 1)
    ll = stats[0, 0] - jnp.float32(pad) * jnp.log1p(-jnp.asarray(q, jnp.float32))
    return C, ll


def _scores_kernel(qcodes_ref, s5_ref, sc_ref, *, W, T, Qp, Wp):
    """Scores-only variant of _kernel: window log-odds, no posterior."""
    codes = qcodes_ref[0]  # (1, T)
    oh = (
        jax.lax.broadcasted_iota(jnp.int32, (Qp, T), 0)
        == jnp.broadcast_to(codes, (Qp, T))
    ).astype(jnp.float32)
    P = jax.lax.dot_general(
        s5_ref[:], oh, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (Wp, T)
    sc = P[0:1, :]
    for j in range(1, W):
        sc = sc + pltpu.roll(P[j : j + 1, :], (T - j) % T, axis=1)
    sc_ref[0] = sc


@functools.partial(jax.jit, static_argnames=("A", "K", "W", "interpret"))
def window_scores(
    s_flat: jnp.ndarray,
    qidx: jnp.ndarray,
    lens: jnp.ndarray,
    map5: jnp.ndarray,
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
    ~45x the gather path's throughput on a v5e.
    """
    from bammmotif2_tpu.ops import escore

    S, N, L = qidx.shape
    Q = (A + 1) ** (K + 1)
    Qp = _round_up(Q, LANE)
    Wp = _round_up(W, LANE)
    SLp = _round_up(S * L, LANE)
    B = _block_seqs(SLp, Qp)
    T = B * SLp
    sentinel = Q - 1

    s5 = s_flat[map5]
    s5 = jnp.pad(s5, ((0, Qp - Q), (0, Wp - W)))
    qn = jnp.moveaxis(qidx, 0, 1).reshape(N, S * L)
    qn = jnp.pad(qn, ((0, 0), (0, SLp - S * L)), constant_values=sentinel)
    pad = (-N) % B
    if pad:
        qn = jnp.concatenate(
            [qn, jnp.full((pad, SLp), sentinel, qn.dtype)], axis=0
        )
    n_blocks = qn.shape[0] // B
    qflat = qn.reshape(n_blocks, 1, T)

    kernel = functools.partial(_scores_kernel, W=W, T=T, Qp=Qp, Wp=Wp)
    sc, = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, 1, T), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Qp, Wp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, T), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((n_blocks, 1, T), jnp.float32)],
        interpret=interpret,
    )(qflat.astype(jnp.int32), s5.astype(jnp.float32))

    n_win = L - W + 1
    # each padded row's first S*L lanes are strand-major [S, L]
    rows = sc.reshape(n_blocks * B, SLp)[:N]          # [N, SLp]
    sc_sl = rows[:, : S * L].reshape(N, S, L)          # [N, S, L]
    scores = jnp.moveaxis(sc_sl, 1, 0)[:, :, :n_win]   # [S, N, n_win]
    mask = escore.window_mask(lens, n_win, W)
    return jnp.where(mask[None], scores, NEG_INF), mask
