"""Bisect the V2 kernel's compiled-mode (TPU) numeric divergence.

Variants (env V2_VARIANT):
  full    - V2 as in probe_v2
  eroll   - E-step window sum via W naive single-row rolls (no skew)
  mroll   - M-step RH via W naive rolls (no skew)
  g1      - force G=1 (no cross-sequence flattening effects)
"""
import os

VARIANT = os.environ.get("V2_VARIANT", "full")

import functools
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bammmotif2_tpu.ops.escore import NEG_INF
import probe_v2 as P2
from probe_v2 import LANE, NT_S, _skew_bits, _round_up, _prep_v2, _lhs_terms


def _kernel(
    q_ref, qflat_ref, lens_ref, lhs_ref, ipos_ref,
    C_ref, stats_ref,
    V, sc_s, rfl_s,
    *, B, G, S, W, SLp, QT, Wp, variant,
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
    ipos = ipos_ref[:].astype(jnp.float32)

    for g0 in range(0, B, G):
        cods = qflat_ref[0, 0:1, g0 * SLp : (g0 + G) * SLp]
        iota_q = jax.lax.broadcasted_iota(jnp.int32, (LANE, GL), 0)

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

        if variant == "eroll":
            sc_flat = P[0:1, :]
            for j in range(1, W):
                sc_flat = sc_flat + pltpu.roll(
                    P[j : j + 1, :], (GL - j) % GL, axis=1)
        else:
            for k in _skew_bits(Wp):
                P = jnp.where(
                    (rowid & k) != 0, pltpu.roll(P, (GL - k) % GL, axis=1), P)
            sc_flat = jnp.sum(P, axis=0, keepdims=True)

        for g in range(G):
            sc_s[g : g + 1, :] = sc_flat[0:1, g * SLp : (g + 1) * SLp]
        sc = sc_s[:]

        lens = lens_ref[0, g0 : g0 + G, :]
        nwin = S * jnp.maximum(lens - (W - 1), 0.0)
        log_prior = jnp.where(
            nwin > 0, jnp.log(q) - jnp.log(jnp.maximum(nwin, 1.0)), NEG_INF)
        mask = (ipos + W) <= lens
        logw = jnp.where(mask, sc + log_prior, NEG_INF)
        m = jnp.maximum(jnp.max(logw, axis=1, keepdims=True), log_r0)
        e = jnp.where(mask, jnp.exp(logw - m), 0.0)
        z = jnp.exp(log_r0 - m) + jnp.sum(e, axis=1, keepdims=True)
        logz = m + jnp.log(z)
        r = e / z

        for g in range(G):
            rfl_s[0:1, g * SLp : (g + 1) * SLp] = r[g : g + 1, :]
        rfl = rfl_s[:]

        if variant == "mroll":
            parts = [rfl]
            for j in range(1, W):
                parts.append(pltpu.roll(rfl, j, axis=1))
            for j in range(W, Wp):
                parts.append(jnp.zeros_like(rfl))
            RH = jnp.concatenate(parts, axis=0)
        else:
            RH = jnp.where(rowid < W, jnp.broadcast_to(rfl, (Wp, GL)), 0.0)
            for k in _skew_bits(Wp):
                RH = jnp.where((rowid & k) != 0, pltpu.roll(RH, k, axis=1), RH)
        t0 = RH.astype(jnp.bfloat16)
        t1 = (RH - t0.astype(jnp.float32)).astype(jnp.bfloat16)
        RHt = jnp.concatenate([t0, t1], axis=0)

        for c in range(NC):
            oh = (iota_q + c * LANE == jnp.broadcast_to(cods, (LANE, GL))
                  ).astype(jnp.bfloat16)
            Cc = jax.lax.dot_general(
                oh, RHt, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            C_ref[c * LANE : (c + 1) * LANE, :] += Cc[:, :Wp] + Cc[:, Wp:]

        stats_ref[0, 0] += jnp.sum(logz)
        stats_ref[0, 1] += jnp.sum(r)


@functools.partial(jax.jit, static_argnames=("A", "K", "W", "R", "variant"))
def em_counts_dbg(s_flat, qidx, lens, q, map5, *, A, K, W, R, variant):
    S, N, L = qidx.shape
    g = P2._geometry_v2(A, K, W, S, L)
    if variant == "g1":
        g["G"] = 1
        g["B"] = _round_up(128, 1)
    qflat, lens_blk, ipos, pad, n_blocks = _prep_v2(qidx, lens, g)
    QT, Wp, SLp, B, G = g["QT"], g["Wp"], g["SLp"], g["B"], g["G"]
    lhs = _lhs_terms(s_flat, map5, W, g)

    kernel = functools.partial(
        _kernel, B=B, G=G, S=S, W=W, SLp=SLp, QT=QT, Wp=Wp,
        variant=variant,
    )
    C, stats = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
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


def main():
    import debug_v2 as D

    K = 2
    s_flat, data = D.build(K=K, N=2000, L=100, W=12)
    R = s_flat.shape[0] - 1
    q = 0.9
    C0, ll0 = jax.block_until_ready(D.oracle(s_flat, data, q, 12, K))
    for variant in ("full", "eroll", "mroll", "g1"):
        C, ll = jax.block_until_ready(em_counts_dbg(
            s_flat, data["qidx"], data["lens"], q, data["map5"],
            A=4, K=K, W=12, R=R, variant=variant))
        dC = float(jnp.max(jnp.abs(C0 - C)) / (jnp.max(jnp.abs(C0)) + 1e-30))
        dll = float(jnp.abs(ll0 - ll))
        print(f"{variant:6s}: dC={dC:.2e} dll_abs={dll:.3e}", flush=True)


if __name__ == "__main__":
    main()
