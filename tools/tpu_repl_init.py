"""Prelude for the persistent TPU measurement REPL (tmux session)."""
import functools
import importlib
import time

import numpy as np
import jax
import jax.numpy as jnp

import ab_bench
from bammmotif2_tpu.refinement.em import em_step

PROBLEMS = {}


def get_problem(K):
    if K not in PROBLEMS:
        import os, subprocess, sys
        npz = f"/tmp/bamm_ab_{K}_{ab_bench.N_SEQS}_{ab_bench.SEQ_LEN}_{ab_bench.W}.npz"
        if not os.path.exists(npz):
            subprocess.run([sys.executable, "ab_bench.py", str(K)],
                           env={**os.environ, "JAX_PLATFORMS": "cpu"},
                           check=True)
        PROBLEMS[K] = ab_bench.load_problem(npz)
    return PROBLEMS[K]


def ab(K, *paths, rounds=3):
    problem = get_problem(K)
    n_win = 2 * ab_bench.N_SEQS * (ab_bench.SEQ_LEN - ab_bench.W + 1)
    best = {}
    for rnd in range(rounds):
        for path in paths:
            ms, ll = ab_bench.time_em(K, path, problem)
            best[path] = min(best.get(path, 1e30), ms)
    for path in paths:
        dt = best[path] / 1e3
        print(f"K={K} {path:10s}: {best[path]:8.3f} ms/iter "
              f"{n_win/dt/1e6:10.1f} Mw/s", flush=True)
    return best


print("REPL READY", flush=True)
