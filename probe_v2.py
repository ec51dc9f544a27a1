"""Probe: batched term-stacked EM kernel (V2) vs current per-row kernel.

V2 design (candidate replacement for ops/pallas_em.py internals):
  - per block of B rows, loop row-chunks of G rows flattened to (1, G*SLp)
  - ONE E-step matmul per lo-chunk: LHS (NT*Wp, 128) @ onehot (128, G*SLp)
    with the NT bf16 residual terms STACKED into the LHS rows
  - window sums via log-skew: 4 full-plane roll+selects instead of W
    single-sublane rolls
  - posterior in (G, SLp) per-row layout (cheap (1,512) lane<->sublane hops)
  - M-step matmul per lo-chunk: onehot (128, G*SLp) @ RH^T (G*SLp, 2*Wp)
  - high orders: NO hi/lo split; the full Q one-hot is chunked over the
    contraction (NC = ceil(Q/128) chunks), so K=0..5 share one path
"""
from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bammmotif2_tpu.ops import pallas_em as cur
from bammmotif2_tpu.ops.escore import NEG_INF

LANE = 128
NT_S = 3
NT_C = 2


def _round_up(x, m):
    return -(-x // m) * m


def _skew_bits(Wp):
    bits, k = [], 1
    while k < Wp:
        bits.append(k)
        k <<= 1
    return bits


def _kernel_v2(
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
    log_r0 = jnp.log1p(-q)
    rowid = jax.lax.broadcasted_iota(jnp.int32, (Wp, GL), 0)
    ipos = ipos_ref[:].astype(jnp.float32)  # (1, SLp)

    for g0 in range(0, B, G):
        cods = qflat_ref[0, 0:1, g0 * SLp : (g0 + G) * SLp]  # (1, GL)
        iota_q = jax.lax.broadcasted_iota(jnp.int32, (LANE, GL), 0)

        # ---- E-step: V = sum_c LHS[:, c] @ onehot_c ----
        for c in range(NC):
            oh = (iota_q + c * LANE == jnp.broadcast_to(cods, (LANE, GL))
                  ).astype(jnp.bfloat16)
            part = jax.lax.dot_general(
                lhs_ref[:, c * LANE : (c + 1) * LANE], oh,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if c == 0:
                V[:] = part
            else:
                V[:] += part

        P = V[0:Wp, :]
        for t in range(1, NT_S):
            P = P + V[t * Wp : (t + 1) * Wp, :]

        # skew: row j rolled by -j, then column-sum -> window scores
        for k in _skew_bits(Wp):
            P = jnp.where(
                (rowid & k) != 0, pltpu.roll(P, (GL - k) % GL, axis=1), P
            )
        sc_flat = jnp.sum(P, axis=0, keepdims=True)  # (1, GL)

        # flat -> (G, SLp)
        for g in range(G):
            sc_s[g : g + 1, :] = sc_flat[0:1, g * SLp : (g + 1) * SLp]
        sc = sc_s[:]

        # ---- ZOOPS posterior in (G, SLp) ----
        lens = lens_ref[0, g0 : g0 + G, :]  # (G, 1)
        nwin = S * jnp.maximum(lens - (W - 1), 0.0)
        log_prior = jnp.where(
            nwin > 0, jnp.log(q) - jnp.log(jnp.maximum(nwin, 1.0)), NEG_INF
        )
        mask = (ipos + W) <= lens  # (G, SLp)
        logw = jnp.where(mask, sc + log_prior, NEG_INF)
        m = jnp.maximum(jnp.max(logw, axis=1, keepdims=True), log_r0)
        e = jnp.where(mask, jnp.exp(logw - m), 0.0)
        z = jnp.exp(log_r0 - m) + jnp.sum(e, axis=1, keepdims=True)
        logz = m + jnp.log(z)
        r = e / z  # (G, SLp)

        # (G, SLp) -> flat
        for g in range(G):
            rfl_s[0:1, g * SLp : (g + 1) * SLp] = r[g : g + 1, :]
        rfl = rfl_s[:]

        # ---- M-step: RH[j, i] = r[i - j] via skew; 2 bf16 terms ----
        RH = jnp.where(rowid < W, jnp.broadcast_to(rfl, (Wp, GL)), 0.0)
        for k in _skew_bits(Wp):
            RH = jnp.where((rowid & k) != 0, pltpu.roll(RH, k, axis=1), RH)
        t0 = RH.astype(jnp.bfloat16)
        t1 = (RH - t0.astype(jnp.float32)).astype(jnp.bfloat16)
        RHt = jnp.concatenate([t0, t1], axis=0)  # (2*Wp, GL) bf16

        for c in range(NC):
            oh = (iota_q + c * LANE == jnp.broadcast_to(cods, (LANE, GL))
                  ).astype(jnp.bfloat16)
            Cc = jax.lax.dot_general(
                oh, RHt, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (128, 2*Wp)
            C_ref[c * LANE : (c + 1) * LANE, :] += Cc[:, :Wp] + Cc[:, Wp:]

        stats_ref[0, 0] += jnp.sum(logz)
        stats_ref[0, 1] += jnp.sum(r)


def _geometry_v2(A, K, W, S, L, max_b=128):
    Q = (A + 1) ** (K + 1)
    QT = _round_up(Q, LANE)
    Wp = _round_up(W, 8)
    SLp = _round_up(S * L, LANE)
    G = max(1, min(16, 8192 // SLp))
    B = _round_up(max_b, G)
    return dict(Q=Q, QT=QT, Wp=Wp, SLp=SLp, G=G, B=B)


def _prep_v2(qidx, lens, g):
    S, N, L = qidx.shape
    SLp, B = g["SLp"], g["B"]
    sentinel = g["Q"] - 1
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


def _lhs_terms(s_flat, map5, W, g):
    """Stacked bf16 term LHS: (NT_S*Wp, QT)."""
    Q, QT, Wp = g["Q"], g["QT"], g["Wp"]
    s5 = s_flat[map5]  # (Q, W)
    s5 = jnp.pad(s5, ((0, QT - Q), (0, Wp - W))).T.astype(jnp.float32)
    # NB: the split must use lax.reduce_precision, NOT a plain astype round
    # trip — under --xla_allow_excess_precision (default on TPU) XLA elides
    # the f32->bf16->f32 rounding and the residual terms collapse to zero,
    # silently degrading the matmul to single-bf16 accuracy (~1e-3).
    terms, r = [], s5
    for i in range(NT_S):
        t32 = jax.lax.reduce_precision(r, exponent_bits=8, mantissa_bits=7)
        terms.append(t32.astype(jnp.bfloat16))
        if i + 1 < NT_S:
            r = r - t32
    return jnp.concatenate(terms, axis=0)  # (NT_S*Wp, QT)


@functools.partial(jax.jit, static_argnames=("A", "K", "W", "R", "interpret"))
def em_counts_v2(s_flat, qidx, lens, q, map5, *, A, K, W, R, interpret=False):
    S, N, L = qidx.shape
    g = _geometry_v2(A, K, W, S, L)
    qflat, lens_blk, ipos, pad, n_blocks = _prep_v2(qidx, lens, g)
    QT, Wp, SLp, B, G = g["QT"], g["Wp"], g["SLp"], g["B"], g["G"]
    lhs = _lhs_terms(s_flat, map5, W, g)

    kernel = functools.partial(
        _kernel_v2, B=B, G=G, S=S, W=W, SLp=SLp, QT=QT, Wp=Wp,
    )
    C, stats = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, B * SLp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((NT_S * Wp, QT), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SLp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((QT, Wp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((QT, Wp), jnp.float32),
            jax.ShapeDtypeStruct((1, 8), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((NT_S * Wp, G * SLp), jnp.float32),
            pltpu.VMEM((G, SLp), jnp.float32),
            pltpu.VMEM((1, G * SLp), jnp.float32),
        ],
    )(
        jnp.asarray(q, jnp.float32).reshape(1, 1),
        qflat, lens_blk, lhs, ipos,
    )
    Cq = C[: g["Q"], :W]
    Cc = jax.ops.segment_sum(Cq, map5, num_segments=R + 1)
    ll = stats[0, 0] - jnp.float32(pad) * jnp.log1p(-jnp.asarray(q, jnp.float32))
    return Cc, ll


def build(K, N=10_000, L=200, W=12, seed=0):
    rng = np.random.default_rng(seed)
    from bammmotif2_tpu.models import seeds as seeds_mod
    from bammmotif2_tpu.models.background import BackgroundModel
    from bammmotif2_tpu.refinement.em import prepare_data
    from bammmotif2_tpu.models.motif import log_odds_lut
    from bammmotif2_tpu.utils.alphabet import Alphabet
    from bammmotif2_tpu.utils.fasta import SequenceSet

    alphabet = Alphabet.from_type("STANDARD")
    codes = rng.integers(0, 4, (N, L)).astype(np.int8)
    lens = np.full(N, L, np.int32)
    sset = SequenceSet(codes=codes, lens=lens,
                       headers=[f"s{i}" for i in range(N)], alphabet=alphabet)
    bg = BackgroundModel.from_sequence_set(sset, order=2, alpha=10.0, ss=False)
    pwm = rng.dirichlet(np.ones(4), W)
    motif = seeds_mod.motif_from_pwm(pwm, K=K, f_bg=sset.base_frequencies())
    data = prepare_data(sset, bg, K, ss=False)
    v = tuple(jnp.asarray(vk, jnp.float32) for vk in motif.v)
    s_flat = log_odds_lut(v, data["bg_flat"])
    return s_flat, data


def main():
    for K in (2, 3, 4, 5):
        s_flat, data = build(K, N=2000, L=100)
        R = s_flat.shape[0] - 1
        args = (s_flat, data["qidx"], data["lens"], 0.9, data["map5"])
        kw = dict(A=4, K=K, W=12, R=R)
        C0, ll0 = jax.block_until_ready(cur.em_counts(*args, **kw))
        C1, ll1 = jax.block_until_ready(em_counts_v2(*args, **kw))
        dC = float(jnp.max(jnp.abs(C0 - C1)) / (jnp.max(jnp.abs(C0)) + 1e-30))
        dll = float(jnp.abs(ll0 - ll1) / (jnp.abs(ll0) + 1e-30))
        print(f"K={K} parity: dC={dC:.2e} dll={dll:.2e}")

    for K in (2, 3, 4, 5):
        s_flat, data = build(K)
        R = s_flat.shape[0] - 1
        args = (s_flat, data["qidx"], data["lens"], 0.9, data["map5"])
        kw = dict(A=4, K=K, W=12, R=R)
        n_win = 2 * 10_000 * (200 - 12 + 1)
        for name, fn in (("cur", cur.em_counts), ("v2", em_counts_v2)):
            out = jax.block_until_ready(fn(*args, **kw))
            t0 = time.perf_counter()
            iters = 20 if K <= 3 else 5
            for _ in range(iters):
                out = fn(*args, **kw)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / iters
            print(f"K={K} {name}: {dt*1e3:8.3f} ms/iter "
                  f"{n_win/dt/1e6:10.1f} Mw/s")


if __name__ == "__main__":
    main()
