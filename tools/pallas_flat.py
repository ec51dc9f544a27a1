"""Flat-layout Pallas TPU kernel for the fused EM data pass.

Second-generation layout for ops.pallas_em's one-hot-matmul formulation
(same math contract — see that module's header for the E/M-step algebra and
the bf16 residual-split precision scheme).  Where pallas_em processes one
sequence row at a time ((B, SLp) tiles, per-row (Wp, SLp) matmuls inside a
loop over B), this kernel flattens G sequence rows into ONE (1, G*SLp) lane
vector and batches the whole row-group through each matmul:

  * E-step: ONE dot per 128-row code chunk — LHS (G*SLp... lhs chunk
    (128, NT*Wp) against the chunk's one-hot (128, G*SLp) — with the NT
    bf16 residual terms of the LUT STACKED into the LHS columns, so the
    precision split costs no extra dispatches, only wider output rows.
  * Window sums via log-skew: row j of the (Wp, G*SLp) score plane is
    rolled left by j using ceil(log2(Wp)) full-plane roll+selects instead
    of W single-row rolls, then one column-sum yields every window score.
  * ZOOPS posterior in (G, SLp) per-row layout (cheap slice hops through a
    VMEM scratch), identical math to pallas_em / ops.escore.
  * M-step: ONE dot per code chunk — one-hot (128, G*SLp) against the
    2-term split of the skew-shifted responsibility plane (2*Wp, G*SLp).
  * High orders take NO hi/lo digit split: the full (A+1)^(K+1) one-hot is
    chunked over the contraction (NC = QT/128 chunks, fori_loop'd when NC
    is large), so K = 0..5 share one code path.  Total MXU work per
    position is QT*(NT_S+..)*Wp MACs — the same as pallas_em's hi/lo
    regrouping (both are Q*Wp*terms; the split only moves the factor
    between the contraction and the output rows) — but the flat layout
    amortizes per-matmul and per-loop overhead over G rows, which is
    where the measured win comes from.

Roll wraparound is harmless for the same reason as in pallas_em: a window
that wraps past a sequence's frontier (here possibly into the NEXT
sequence's lanes) always fails the ``i + W <= len`` mask, and M-step wraps
only ever read responsibilities that are exactly zero (each strand
segment's last W-1 window positions are masked).

Precision note: the LUT's bf16 residual terms are computed OUTSIDE the
kernel (XLA) and must use ``lax.reduce_precision`` — under TPU XLA's
default ``--xla_allow_excess_precision`` a plain f32->bf16->f32 round trip
is elided and the residual terms silently collapse to zero, degrading the
scores matmul to single-bf16 accuracy (~1e-3; observed on hardware).

Parity: equivalent-to-tolerance counts/ll vs ops.escore (<= 1e-5,
tests/test_pallas_em.py::TestFlatKernel, incl. ragged lengths and
lens < W), and vs the f64-capable gather path on device.

Reference behavior covered: EM::EStep/MStep hot loops (SURVEY.md 3.2) and
ScoreSeqSet::calcLogOdds (SURVEY.md 3.3) via the scores-only variant.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bammmotif2_tpu.ops.escore import NEG_INF

LANE = 128
SUBLANE = 8

NT_SCORES = 3  # bf16 LUT split terms for the E-step matmul (3 == full f32)
NT_COUNTS = 2  # split terms for the M-step matmul (posterior rounding wins)

MAX_UNROLL_NC = 5  # chunk loops longer than this run as fori_loop
_VMEM_BUDGET = 10 * 1024 * 1024  # in-kernel bytes to aim for (16M scoped cap)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _skew_bits(Wp: int):
    bits, k = [], 1
    while k < Wp:
        bits.append(k)
        k <<= 1
    return bits


def _geometry(A, K, W, S, L):
    Q = (A + 1) ** (K + 1)
    QT = _round_up(Q, LANE)
    NC = QT // LANE
    Wp = _round_up(W, SUBLANE)
    NTW = NT_SCORES * Wp
    SLp = _round_up(S * L, LANE)

    # Per-lane-of-GL byte costs. Live at once: V scratch + score/posterior
    # planes + one chunk's temporaries (one-hot bf16, dot output f32, skew
    # plane f32, M-step split planes); unrolled chunk loops may stack up to
    # MAX_UNROLL_NC chunk temporaries.
    chunk_tmp = LANE * 2 + NTW * 4  # one-hot + dot output
    n_live = min(NC, MAX_UNROLL_NC)
    per_gl = (
        NTW * 4  # V scratch
        + 8  # sc_s + rfl_s
        + Wp * 4  # skewed score / RH plane
        + 2 * Wp * 2  # RHt bf16
        + n_live * chunk_tmp
    )
    fixed = QT * NTW * 2 + QT * Wp * 4  # lhs terms + C accumulator
    avail = max(_VMEM_BUDGET - fixed, per_gl * SLp)
    G = int(max(1, min(16, avail // (per_gl * SLp))))
    B = _round_up(128, G)
    need_g1 = fixed + per_gl * SLp  # VMEM floor at G == 1
    return dict(Q=Q, QT=QT, NC=NC, Wp=Wp, SLp=SLp, G=G, B=B,
                need_g1=need_g1)


def supported(A, K, W, S, L) -> bool:
    """True if the flat kernel fits VMEM for this shape."""
    return _geometry(A, K, W, S, L)["need_g1"] <= 14 * 1024 * 1024


def _split_terms_xla(x, n):
    """x (f32) == sum of n bf16 terms; computed in XLA, so the rounding must
    be an explicit lax.reduce_precision (see module header)."""
    terms, r = [], x
    for i in range(n):
        t32 = jax.lax.reduce_precision(r, exponent_bits=8, mantissa_bits=7)
        terms.append(t32.astype(jnp.bfloat16))
        if i + 1 < n:
            r = r - t32
    return terms


def _lhs_terms(s_flat, map5, W, g):
    """LUT as stacked bf16 term columns, chunk-sliceable on sublanes:
    lhsT (QT, NT_SCORES*Wp) with lhsT[c, t*Wp + j] = term_t(s5[c, j])."""
    Q, QT, Wp = g["Q"], g["QT"], g["Wp"]
    s5 = s_flat[map5]  # (Q, W)
    s5 = jnp.pad(s5, ((0, QT - Q), (0, Wp - W))).astype(jnp.float32)
    terms = _split_terms_xla(s5, NT_SCORES)
    return jnp.concatenate(terms, axis=1)  # (QT, NT_SCORES*Wp) bf16


def _prep(qidx, lens, g):
    """Block layout: codes as (n_blocks, 1, B*SLp) flat lane vectors."""
    S, N, L = qidx.shape
    SLp, B = g["SLp"], g["B"]
    sentinel = g["Q"] - 1  # all digits == A -> zero-score sentinel row

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
    qflat = qn.reshape(n_blocks, 1, B * SLp).astype(jnp.int32)
    lens_blk = (
        lens.astype(jnp.float32).reshape(n_blocks, B, 1)
        if lens is not None else None
    )
    ipos = np.concatenate(
        [np.tile(np.arange(L, dtype=np.int32), S),
         np.full(SLp - S * L, 1 << 28, np.int32)]
    ).reshape(1, SLp)
    return qflat, lens_blk, jnp.asarray(ipos), pad, n_blocks


def _escore_group(cods, lhs_ref, V, *, NC, Wp, GL):
    """Position-score plane for one row group: P (Wp, GL), f32-exact.

    V (scratch): (NT_SCORES*Wp, GL) term accumulator across code chunks.
    """
    iota_q = jax.lax.broadcasted_iota(jnp.int32, (LANE, GL), 0)
    codb = jnp.broadcast_to(cods, (LANE, GL))

    def chunk(c, base):
        oh = (iota_q + base == codb).astype(jnp.bfloat16)
        lhs_c = lhs_ref[pl.ds(base, LANE), :]  # (LANE, NT*Wp) bf16
        return jax.lax.dot_general(
            lhs_c, oh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (NT*Wp, GL)

    if NC <= MAX_UNROLL_NC:
        for c in range(NC):
            part = chunk(c, c * LANE)
            if c == 0:
                V[:] = part
            else:
                V[:] += part
    else:
        V[:] = chunk(0, 0)

        def body(c, _):
            V[:] += chunk(c, c * LANE)
            return 0

        jax.lax.fori_loop(1, NC, body, 0)

    P = V[0:Wp, :]
    for t in range(1, NT_SCORES):
        P = P + V[t * Wp : (t + 1) * Wp, :]
    return P


def _window_sums(P, *, W, Wp, GL):
    """sc[i] = sum_j P[j, i+j] via log-skew: roll row j left by j with
    log2(Wp) full-plane roll+selects, then column-sum."""
    rowid = jax.lax.broadcasted_iota(jnp.int32, (Wp, GL), 0)
    for k in _skew_bits(Wp):
        P = jnp.where(
            (rowid & k) != 0, pltpu.roll(P, (GL - k) % GL, axis=1), P
        )
    return jnp.sum(P, axis=0, keepdims=True)  # (1, GL)


def _mstep_group(cods, rfl, C_ref, *, NC, W, Wp, GL):
    """C_ref (QT, Wp) += counts of one row group from flat responsibilities
    rfl (1, GL): RH[j, i] = rfl[i-j] via skew, 2-term bf16 split, one dot
    per code chunk accumulated into the chunk's C_ref rows."""
    rowid = jax.lax.broadcasted_iota(jnp.int32, (Wp, GL), 0)
    RH = jnp.where(rowid < W, jnp.broadcast_to(rfl, (Wp, GL)), 0.0)
    for k in _skew_bits(Wp):
        RH = jnp.where((rowid & k) != 0, pltpu.roll(RH, k, axis=1), RH)
    # in-kernel split: Mosaic compiles the round trip literally (cf. header)
    t0 = RH.astype(jnp.bfloat16)
    t1 = (RH - t0.astype(jnp.float32)).astype(jnp.bfloat16)
    RHt = jnp.concatenate([t0, t1], axis=0)  # (2*Wp, GL) bf16

    iota_q = jax.lax.broadcasted_iota(jnp.int32, (LANE, GL), 0)
    codb = jnp.broadcast_to(cods, (LANE, GL))

    def chunk(c, base):
        oh = (iota_q + base == codb).astype(jnp.bfloat16)
        Cc = jax.lax.dot_general(
            oh, RHt, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (LANE, 2*Wp)
        C_ref[pl.ds(base, LANE), :] += Cc[:, :Wp] + Cc[:, Wp:]
        return 0

    if NC <= MAX_UNROLL_NC:
        for c in range(NC):
            chunk(c, c * LANE)
    else:
        jax.lax.fori_loop(0, NC, lambda c, _: chunk(c, c * LANE), 0)


def _zoops_group(sc, lens_g, ipos, q, *, S, W, G, SLp):
    """ZOOPS posterior for one (G, SLp) score group; matches
    ops.escore.zoops_posterior row-for-row.  Returns (r, logz)."""
    log_r0 = jnp.log1p(-q)
    nwin = S * jnp.maximum(lens_g - (W - 1), 0.0)  # (G, 1)
    log_prior = jnp.where(
        nwin > 0, jnp.log(q) - jnp.log(jnp.maximum(nwin, 1.0)), NEG_INF
    )
    mask = (ipos + W) <= lens_g  # (G, SLp)
    logw = jnp.where(mask, sc + log_prior, NEG_INF)
    m = jnp.maximum(jnp.max(logw, axis=1, keepdims=True), log_r0)
    e = jnp.where(mask, jnp.exp(logw - m), 0.0)
    z = jnp.exp(log_r0 - m) + jnp.sum(e, axis=1, keepdims=True)
    logz = m + jnp.log(z)  # (G, 1)
    return e / z, logz


def _em_kernel(
    q_ref, qflat_ref, lens_ref, lhs_ref, ipos_ref,
    C_ref, stats_ref,
    V, sc_s, rfl_s,
    *, B, G, S, W, SLp, QT, Wp,
):
    NC = QT // LANE
    GL = G * SLp

    @pl.when(pl.program_id(0) == 0)
    def _():
        C_ref[:] = jnp.zeros_like(C_ref)
        stats_ref[0, 0] = 0.0
        stats_ref[0, 1] = 0.0

    q = q_ref[0, 0]
    ipos = ipos_ref[:].astype(jnp.float32)  # (1, SLp)

    for g0 in range(0, B, G):
        cods = qflat_ref[0, 0:1, g0 * SLp : (g0 + G) * SLp]  # (1, GL)

        P = _escore_group(cods, lhs_ref, V, NC=NC, Wp=Wp, GL=GL)
        sc_flat = _window_sums(P, W=W, Wp=Wp, GL=GL)

        # flat -> (G, SLp) rows
        for g in range(G):
            sc_s[g : g + 1, :] = sc_flat[0:1, g * SLp : (g + 1) * SLp]

        lens_g = lens_ref[0, g0 : g0 + G, :]  # (G, 1)
        r, logz = _zoops_group(
            sc_s[:], lens_g, ipos, q, S=S, W=W, G=G, SLp=SLp
        )

        # (G, SLp) -> flat
        for g in range(G):
            rfl_s[0:1, g * SLp : (g + 1) * SLp] = r[g : g + 1, :]

        _mstep_group(cods, rfl_s[:], C_ref, NC=NC, W=W, Wp=Wp, GL=GL)

        stats_ref[0, 0] += jnp.sum(logz)
        stats_ref[0, 1] += jnp.sum(r)


@functools.partial(
    jax.jit, static_argnames=("A", "K", "W", "R", "interpret")
)
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
    """Fused E+M data pass; same contract as ops.pallas_em.em_counts."""
    S, N, L = qidx.shape
    g = _geometry(A, K, W, S, L)
    qflat, lens_blk, ipos, pad, n_blocks = _prep(qidx, lens, g)
    QT, Wp, SLp, B, G = g["QT"], g["Wp"], g["SLp"], g["B"], g["G"]
    lhs = _lhs_terms(s_flat, map5, W, g)

    kernel = functools.partial(
        _em_kernel, B=B, G=G, S=S, W=W, SLp=SLp, QT=QT, Wp=Wp,
    )
    C, stats = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, B * SLp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((QT, NT_SCORES * Wp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SLp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((QT, Wp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((QT, Wp), jnp.float32),
            jax.ShapeDtypeStruct((1, 8), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((NT_SCORES * Wp, G * SLp), jnp.float32),
            pltpu.VMEM((G, SLp), jnp.float32),
            pltpu.VMEM((1, G * SLp), jnp.float32),
        ],
        interpret=interpret,
    )(
        jnp.asarray(q, jnp.float32).reshape(1, 1),
        qflat, lens_blk, lhs, ipos,
    )
    Cq = C[: g["Q"], :W]
    Cc = jax.ops.segment_sum(Cq, map5, num_segments=R + 1)
    # zero-length pad rows each contribute exactly log(1-q)
    ll = stats[0, 0] - jnp.float32(pad) * jnp.log1p(
        -jnp.asarray(q, jnp.float32)
    )
    return Cc, ll


def _scores_kernel(
    qflat_ref, lhs_ref, sc_ref, V,
    *, B, G, W, SLp, QT, Wp,
):
    NC = QT // LANE
    GL = G * SLp
    for g0 in range(0, B, G):
        cods = qflat_ref[0, 0:1, g0 * SLp : (g0 + G) * SLp]
        P = _escore_group(cods, lhs_ref, V, NC=NC, Wp=Wp, GL=GL)
        sc_flat = _window_sums(P, W=W, Wp=Wp, GL=GL)
        for g in range(G):
            sc_ref[0, g0 + g : g0 + g + 1, :] = (
                sc_flat[0:1, g * SLp : (g + 1) * SLp]
            )


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
    """Flat-layout window scoring; same contract as
    ops.pallas_em.window_scores (scanner hot path)."""
    from bammmotif2_tpu.ops import escore

    S, N, L = qidx.shape
    g = _geometry(A, K, W, S, L)
    qflat, _, _, pad, n_blocks = _prep(qidx, None, g)
    QT, Wp, SLp, B, G = g["QT"], g["Wp"], g["SLp"], g["B"], g["G"]
    lhs = _lhs_terms(s_flat, map5, W, g)

    kernel = functools.partial(
        _scores_kernel, B=B, G=G, W=W, SLp=SLp, QT=QT, Wp=Wp,
    )
    sc, = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, 1, B * SLp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((QT, NT_SCORES * Wp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, B, SLp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((n_blocks, B, SLp), jnp.float32)],
        scratch_shapes=[
            pltpu.VMEM((NT_SCORES * Wp, G * SLp), jnp.float32),
        ],
        interpret=interpret,
    )(qflat, lhs)

    n_win = L - W + 1
    rows = sc.reshape(n_blocks * B, SLp)[:N]       # [N, SLp]
    sc_sl = rows[:, : S * L].reshape(N, S, L)      # [N, S, L]
    scores = jnp.moveaxis(sc_sl, 1, 0)[:, :, :n_win]  # [S, N, n_win]
    mask = escore.window_mask(lens, n_win, W)
    return jnp.where(mask[None], scores, NEG_INF), mask


def _counts_kernel(
    qflat_ref, r_ref, C_ref,
    *, B, G, W, SLp, QT, Wp,
):
    NC = QT // LANE
    GL = G * SLp

    @pl.when(pl.program_id(0) == 0)
    def _():
        C_ref[:] = jnp.zeros_like(C_ref)

    for g0 in range(0, B, G):
        cods = qflat_ref[0, 0:1, g0 * SLp : (g0 + G) * SLp]
        rfl = r_ref[0, 0:1, g0 * SLp : (g0 + G) * SLp]
        _mstep_group(cods, rfl, C_ref, NC=NC, W=W, Wp=Wp, GL=GL)


@functools.partial(jax.jit, static_argnames=("A", "K", "W", "R", "interpret"))
def counts_from_r(
    r_snl: jnp.ndarray,
    qidx: jnp.ndarray,
    map5: jnp.ndarray,
    *,
    A: int,
    K: int,
    W: int,
    R: int,
    interpret: bool = False,
):
    """M-step counts from an explicit responsibility tensor (CGS path);
    same contract as ops.pallas_em.counts_from_r."""
    S, N, L = qidx.shape
    g = _geometry(A, K, W, S, L)
    qflat, _, _, pad, n_blocks = _prep(qidx, None, g)
    QT, Wp, SLp, B, G = g["QT"], g["Wp"], g["SLp"], g["B"], g["G"]

    rn = jnp.moveaxis(r_snl, 0, 1).reshape(N, S * L)
    rn = jnp.pad(rn, ((0, 0), (0, SLp - S * L)))
    if pad:
        rn = jnp.concatenate([rn, jnp.zeros((pad, SLp), rn.dtype)], axis=0)
    rflat = rn.reshape(n_blocks, 1, B * SLp).astype(jnp.float32)

    kernel = functools.partial(
        _counts_kernel, B=B, G=G, W=W, SLp=SLp, QT=QT, Wp=Wp,
    )
    C, = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, 1, B * SLp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, B * SLp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((QT, Wp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((QT, Wp), jnp.float32)],
        interpret=interpret,
    )(qflat, rflat)

    Cq = C[: g["Q"], :W]
    return jax.ops.segment_sum(Cq, map5, num_segments=R + 1)
