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

  * Indexing is lifted to the base-(A+1) code space (ops.encode.
    base5_kmer_index): symbol A = "no base" (boundary/ambiguous).  A static
    map (map_base5_to_combined) relates codes to combined-LUT rows, so the
    per-iteration score table ``s5[c] = s_flat[map5[c]]`` is a tiny gather
    of <= (A+1)^(K+1) rows done outside the kernel.
  * Per sequence row b, the transposed one-hot ``oh_b[c, i] = (code[b, i]
    == c)`` is an iota compare built IN VMEM (never touches HBM), exactly
    representable in bf16.
  * E-step scores  P[b] = s5^T @ oh_b  -> (Wp, SLp) per row       (MXU)
  * Window scores  sc[b, i] = sum_j P[b, j, i+j]  -> W lane-rolls (VPU)
  * ZOOPS posterior: per-row max / exp / sum / divide             (VPU)
  * M-step counts  C5 += oh_b @ Rw_b^T, Rw_b[j, i] = r[b, i-j]    (MXU)

Matmul precision: the MXU is bf16; instead of ``Precision.HIGHEST`` (6
bf16 passes emulating fp32 x fp32) the f32 operand is split into bf16
residual terms and multiplied against the EXACT bf16 one-hot — 3 terms
reproduce full f32 precision in half the passes (scores), 2 terms are
used for the counts matmul whose error is dominated by the ~5e-6 relative
rounding of the posterior normalization either way.

HBM traffic per iteration ~= one read of the int32 code tensor.  Counts
return in the base-(A+1) space and are folded to combined rows with one
tiny segment-sum.  Supported for K <= 3 ((A+1)^(K+1) <= 640); higher
orders use the XLA path.

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
_VMEM_BUDGET = 10 * 1024 * 1024  # bytes of in-kernel temporaries to aim for

NT_SCORES = 3  # bf16 split terms for the E-step matmul (3 == full f32)
NT_COUNTS = 2  # for the M-step matmul (posterior rounding dominates anyway)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def supported(K: int, A: int = 4) -> bool:
    return (A + 1) ** (K + 1) <= 640


def _block_seqs(SLp: int, Wp: int) -> int:
    """Sequences per block: two (B, Wp, SLp) f32 scratches plus ~8 (B, SLp)
    f32 row temporaries must fit the VMEM budget."""
    per_seq = SLp * (8 * Wp + 32)
    return max(1, min(MAX_B, _VMEM_BUDGET // per_seq))


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


def _onehot_row(codes, b, Qp, SLp):
    """(Qp, SLp) bf16 transposed one-hot of sequence row b (VMEM-only)."""
    iota_q = jax.lax.broadcasted_iota(jnp.int32, (Qp, SLp), 0)
    return (
        iota_q == jnp.broadcast_to(codes[b : b + 1, :], (Qp, SLp))
    ).astype(jnp.bfloat16)


def _kernel(
    q_ref, qcodes_ref, lens_ref, s5_ref, ipos_ref,
    C5_ref, stats_ref, P3, rw3,
    *, B, S, W, SLp, Qp, Wp,
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
    codes = qcodes_ref[0]  # (B, SLp) int32

    # E-step scores per row: P3[b, j, i] = s5[code[b, i], j]
    for b in range(B):
        oh_b = _onehot_row(codes, b, Qp, SLp)
        P3[b] = _split_dot(s5_ref[:], oh_b, (((0,), (0,)), ((), ())), NT_SCORES)

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
    for b in range(B):
        oh_b = _onehot_row(codes, b, Qp, SLp)
        C5_ref[:] += _split_dot(
            rw3[b], oh_b, (((1,), (1,)), ((), ())), NT_COUNTS
        ).T

    stats_ref[0, 0] += jnp.sum(logz)
    stats_ref[0, 1] += jnp.sum(r)


def _prep(qidx, lens, A, K, W):
    """Shared block layout: (n_blocks, B, SLp) codes + per-block lens."""
    S, N, L = qidx.shape
    Q = (A + 1) ** (K + 1)
    Qp = _round_up(Q, LANE)
    Wp = _round_up(W, SUBLANE)
    SLp = _round_up(S * L, LANE)
    B = _block_seqs(SLp, Wp)
    sentinel = Q - 1  # all digits == A -> maps to the zero-score sentinel row

    qn = jnp.moveaxis(qidx, 0, 1).reshape(N, S * L)
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
    return qblk, lens_blk, jnp.asarray(ipos), dict(
        S=S, N=N, L=L, Q=Q, Qp=Qp, Wp=Wp, SLp=SLp, B=B, pad=pad,
        n_blocks=n_blocks,
    )


def _padded_lut(s_flat, map5, Q, Qp, W, Wp):
    s5 = s_flat[map5]  # [Q, W]
    return jnp.pad(s5, ((0, Qp - Q), (0, Wp - W))).astype(jnp.float32)


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
    qblk, lens_blk, ipos, d = _prep(qidx, lens, A, K, W)
    Qp, Wp, SLp, B = d["Qp"], d["Wp"], d["SLp"], d["B"]
    s5 = _padded_lut(s_flat, map5, d["Q"], Qp, W, Wp)

    kernel = functools.partial(
        _kernel, B=B, S=d["S"], W=W, SLp=SLp, Qp=Qp, Wp=Wp
    )
    C5, stats = pl.pallas_call(
        kernel,
        grid=(d["n_blocks"],),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, B, SLp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Qp, Wp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SLp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((Qp, Wp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Qp, Wp), jnp.float32),
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
        s5,
        ipos,
    )

    C = jax.ops.segment_sum(C5[: d["Q"], :W], map5, num_segments=R + 1)
    ll = stats[0, 0] - jnp.float32(d["pad"]) * jnp.log1p(
        -jnp.asarray(q, jnp.float32)
    )
    return C, ll


def _scores_kernel(qcodes_ref, s5_ref, sc_ref, P3, *, B, W, SLp, Qp, Wp):
    """Scores-only variant of _kernel: window log-odds, no posterior."""
    codes = qcodes_ref[0]  # (B, SLp)
    for b in range(B):
        oh_b = _onehot_row(codes, b, Qp, SLp)
        P3[b] = _split_dot(s5_ref[:], oh_b, (((0,), (0,)), ((), ())), NT_SCORES)
    sc = P3[:, 0, :]
    for j in range(1, W):
        sc = sc + pltpu.roll(P3[:, j, :], (SLp - j) % SLp, axis=1)
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
    ~100x the gather path's throughput on a v5e.
    """
    from bammmotif2_tpu.ops import escore

    S, N, L = qidx.shape
    qblk, _, _, d = _prep(qidx, None, A, K, W)
    Qp, Wp, SLp, B = d["Qp"], d["Wp"], d["SLp"], d["B"]
    s5 = _padded_lut(s_flat, map5, d["Q"], Qp, W, Wp)

    kernel = functools.partial(
        _scores_kernel, B=B, W=W, SLp=SLp, Qp=Qp, Wp=Wp
    )
    sc, = pl.pallas_call(
        kernel,
        grid=(d["n_blocks"],),
        in_specs=[
            pl.BlockSpec((1, B, SLp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Qp, Wp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, B, SLp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((d["n_blocks"], B, SLp), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((B, Wp, SLp), jnp.float32)],
        interpret=interpret,
    )(qblk, s5)

    n_win = L - W + 1
    # each row's first S*L lanes are strand-major [S, L]
    rows = sc.reshape(d["n_blocks"] * B, SLp)[:N]       # [N, SLp]
    sc_sl = rows[:, : S * L].reshape(N, S, L)           # [N, S, L]
    scores = jnp.moveaxis(sc_sl, 1, 0)[:, :, :n_win]    # [S, N, n_win]
    mask = escore.window_mask(lens, n_win, W)
    return jnp.where(mask[None], scores, NEG_INF), mask
