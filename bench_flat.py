"""Benchmark + parity: pallas_em (row layout) vs pallas_flat on real TPU.

Usage: python bench_flat.py K [K...]   (full bench size: 10k x 200bp, W=12)

Parity is checked against pallas_em, which is itself verified against the
f32 gather oracle (tests/test_pallas_em.py, and on-device to <= 4e-6).
"""
import functools
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

import debug_v2 as D
from bammmotif2_tpu.ops import pallas_em as cur
from bammmotif2_tpu.ops import pallas_flat as flat


def build_cached(K, N, L, W):
    path = f"/tmp/bamm_bench_{K}_{N}_{L}_{W}.npz"
    if os.path.exists(path):
        z = np.load(path)
        return jnp.asarray(z["s_flat"]), {
            "qidx": jnp.asarray(z["qidx"]),
            "lens": jnp.asarray(z["lens"]),
            "map5": jnp.asarray(z["map5"]),
        }
    s_flat, data = D.build(K=K, N=N, L=L, W=W)
    np.savez(path, s_flat=np.asarray(s_flat), qidx=np.asarray(data["qidx"]),
             lens=np.asarray(data["lens"]), map5=np.asarray(data["map5"]))
    return s_flat, data


def main():
    Ks = [int(a) for a in sys.argv[1:]] or [2]
    N, L, W = 10_000, 200, 12
    q = 0.9
    for K in Ks:
        s_flat, data = build_cached(K, N, L, W)
        R = s_flat.shape[0] - 1
        args = (s_flat, data["qidx"], data["lens"], q, data["map5"])
        kw = dict(A=4, K=K, W=W, R=R)
        S = data["qidx"].shape[0]
        n_win = S * N * (L - W + 1)
        outs = {}
        for name, mod in (("cur", cur), ("flat", flat)):
            fn = mod.em_counts

            # Chained host loop, MARGINAL timing: the fixed cost of the
            # axon tunnel (pipeline fill + RTT) is large and variable, so
            # time a short and a long chained loop and difference them.
            @jax.jit
            def step(s, qidx, lens, q, map5):
                C, ll = fn(s, qidx, lens, q, map5, **kw)
                return C, ll, s + 1e-6 * ll

            outs[name] = jax.block_until_ready(fn(*args, **kw))
            C, ll, s = step(*args)
            jax.block_until_ready((C, ll, s))
            n_lo, n_hi = (10, 40) if K <= 3 else (4, 16)
            times = []
            for iters in (n_lo, n_hi):
                t0 = time.perf_counter()
                for _ in range(iters):
                    C, ll, s = step(s, *args[1:])
                jax.block_until_ready((C, ll, s))
                times.append(time.perf_counter() - t0)
            dt = (times[1] - times[0]) / (n_hi - n_lo)
            print(f"K={K} {name:4s}: {dt*1e3:8.3f} ms/iter "
                  f"{n_win/dt/1e6:10.1f} Mw/s", flush=True)
        C0, ll0 = outs["cur"]
        C1, ll1 = outs["flat"]
        dC = float(jnp.max(jnp.abs(C0 - C1)) / (jnp.max(jnp.abs(C0)) + 1e-30))
        print(f"K={K} flat-vs-cur: dC={dC:.2e} "
              f"dll={float(jnp.abs(ll0-ll1)):.2e}", flush=True)


if __name__ == "__main__":
    main()
