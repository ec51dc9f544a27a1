"""Driver benchmark: EM window-scoring throughput on one chip.

Measures the BASELINE.json metric — "EM sequence-windows scored/sec/chip at
order-2; iterations/sec on 10k-seq set" — by timing fused EM iterations on
a synthetic 10k x 200 bp planted-motif set (both strands, W=12, K=2).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "windows/sec/chip",
     "vs_baseline": N, ...}

`vs_baseline` anchor: the reference publishes NO numbers (BASELINE.json
`published: {}`) and the reference mount was empty, so the anchor is a
self-measured CPU run of the same EM step (JAX CPU backend, this machine),
standing in for the reference's single-node CPU performance.  The anchor is
cached in BENCH_ANCHOR.json after the first run.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

N_SEQS = 10_000
SEQ_LEN = 200
W = 12
K = 2
N_TIMED_ITERS = 30
ANCHOR_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_ANCHOR.json")


def build_problem():
    import jax.numpy as jnp

    from bammmotif2_tpu.models import seeds as seeds_mod
    from bammmotif2_tpu.models.background import BackgroundModel
    from bammmotif2_tpu.refinement.em import prepare_data
    from bammmotif2_tpu.utils.alphabet import Alphabet
    from bammmotif2_tpu.utils.fasta import SequenceSet

    rng = np.random.default_rng(0)
    alphabet = Alphabet.from_type("STANDARD")
    codes = rng.integers(0, 4, (N_SEQS, SEQ_LEN)).astype(np.int8)
    motif_codes = rng.integers(0, 4, W)
    pos = rng.integers(0, SEQ_LEN - W, N_SEQS)
    has = rng.random(N_SEQS) < 0.8
    for n in range(N_SEQS):
        if has[n]:
            codes[n, pos[n] : pos[n] + W] = motif_codes
    lens = np.full(N_SEQS, SEQ_LEN, np.int32)
    sset = SequenceSet(
        codes=codes,
        lens=lens,
        headers=[f"s{i}" for i in range(N_SEQS)],
        alphabet=alphabet,
    )
    bg = BackgroundModel.from_sequence_set(sset, order=2, alpha=10.0, ss=False)
    pwm = np.full((W, 4), 0.1, np.float64)
    pwm[np.arange(W), motif_codes] = 0.7
    motif = seeds_mod.motif_from_pwm(pwm, K=K, f_bg=sset.base_frequencies())
    data = prepare_data(sset, bg, K, ss=False)
    v = tuple(jnp.asarray(vk, jnp.float32) for vk in motif.v)
    alphas = jnp.asarray(motif.alphas, jnp.float32)
    f_bg = jnp.asarray(motif.f_bg, jnp.float32)
    q = jnp.asarray(0.9, jnp.float32)
    n_windows_per_iter = 2 * int(np.maximum(lens - W + 1, 0).sum())
    return v, q, data, alphas, f_bg, n_windows_per_iter


def time_em(path: str) -> tuple[float, float]:
    """Returns (windows_per_sec, iters_per_sec) for the given data path.

    All timed iterations run inside ONE jitted lax.fori_loop — a single
    device dispatch, exactly how run_em executes the EM loop in
    production.  (The previous chained host loop paid one tunnel dispatch
    per iteration, which on a bad day is 5-10x the kernel time and swings
    2x run-to-run.)  Best of 3 timed loops.
    """
    import functools

    import jax
    import jax.numpy as jnp

    from bammmotif2_tpu.refinement.em import em_step

    v, q, data, alphas, f_bg, n_win = build_problem()
    nr = jnp.asarray(float(N_SEQS), jnp.float32)

    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(v, q, n):
        def body(_, carry):
            v, q = carry
            v1, q1, ll, vd = em_step(
                v, q, data, alphas, f_bg, nr,
                A=4, K=K, W=W, optimize_q=True, path=path,
            )
            return v1, q1

        return jax.lax.fori_loop(0, n, body, (v, q))

    jax.block_until_ready(loop(v, q, N_TIMED_ITERS))  # compile + warm
    dt = min(
        _timed(lambda: jax.block_until_ready(loop(v, q, N_TIMED_ITERS)))
        for _ in range(3)
    )
    return n_win * N_TIMED_ITERS / dt, N_TIMED_ITERS / dt


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def time_em_multi(M: int = 3) -> float:
    """Aggregate multi-seed EM throughput (windows/s summed over seeds).

    M seeds stacked into ONE Pallas kernel per iteration — the seed LUTs
    ride the matmuls' output rows (pallas_em.em_counts_multi via
    refinement.multi's batched step), the MXU-fill configuration of
    BASELINE config 4 ("top-10 PEnG seeds in parallel").
    """
    import functools

    import jax
    import jax.numpy as jnp

    from bammmotif2_tpu.refinement.multi import _pallas_batched_step

    v1, q1, data, alphas1, f_bg, n_win = build_problem()
    nr = jnp.asarray(float(N_SEQS), jnp.float32)
    v = tuple(jnp.stack([vk] * M) for vk in v1)
    q = jnp.full((M,), 0.9, jnp.float32)
    alphas = jnp.stack([alphas1] * M)
    step = _pallas_batched_step(4, K, W, True, mesh=None, interpret=False)

    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(v, q, n):
        def body(_, carry):
            vv, qq, _ll, _vd = step(carry[0], carry[1], data, alphas, f_bg, nr)
            return vv, qq

        return jax.lax.fori_loop(0, n, body, (v, q))

    jax.block_until_ready(loop(v, q, N_TIMED_ITERS))  # compile + warm
    dt = min(
        _timed(lambda: jax.block_until_ready(loop(v, q, N_TIMED_ITERS)))
        for _ in range(3)
    )
    return M * n_win * N_TIMED_ITERS / dt


def time_scan() -> float:
    """Scanner throughput: the scores-only Pallas kernel on the same set.

    Device-resident loop (same methodology as time_em): N_TIMED_ITERS
    scoring passes chained inside ONE jitted fori_loop via a scalar
    carrier — the previous per-call host loop measured 0.5–1.0 B w/s for
    a kernel that runs at 2.1–2.4 B, pure tunnel-dispatch noise.
    """
    import functools

    import jax

    from bammmotif2_tpu.models.motif import log_odds_lut
    from bammmotif2_tpu.ops import pallas_em

    v, q, data, alphas, f_bg, n_win = build_problem()
    s_flat = log_odds_lut(v, data["bg_flat"])

    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(s, n):
        def body(_, s):
            sc, _m = pallas_em.window_scores(
                s, data["cidx"], data["lens"], A=4, K=K, W=W
            )
            return s + 0.0 * sc[0, 0, 0]  # data dependence between passes

        return jax.lax.fori_loop(0, n, body, s)

    jax.block_until_ready(loop(s_flat, N_TIMED_ITERS))  # compile + warm
    dt = min(
        _timed(lambda: jax.block_until_ready(loop(s_flat, N_TIMED_ITERS)))
        for _ in range(5)  # scan runs are short; 5 rounds tame tunnel noise
    )
    return n_win * N_TIMED_ITERS / dt


def time_cgs(M: int = 1) -> float:
    """CGS sweep throughput (windows/s; each sweep scores every window once).

    The second refinement engine at config scale: full collapsed-Gibbs
    sweeps (z + q sampling + alpha gradient step) chained inside one
    jitted fori_loop.  M = 1 times the plain path, M > 1 the seed-stacked
    gibbs_step_multi (LUTs riding the kernel's output rows, as in
    run_gibbs_multi).
    """
    import functools

    import jax
    import jax.numpy as jnp

    from bammmotif2_tpu.refinement.gibbs import gibbs_step, gibbs_step_multi

    v1, q1, data, alphas1, f_bg, n_win = build_problem()
    nr = jnp.asarray(float(N_SEQS), jnp.float32)
    statics = dict(
        A=4, K=K, W=W, sample_z=True, sample_q=True, learn_alpha=True,
        path="pallas", mesh=None,
    )
    if M == 1:
        v = v1
        q = jnp.asarray(0.9, jnp.float32)
        la = jnp.log(alphas1)
        da = alphas1
        key = jax.random.PRNGKey(0)
        step = functools.partial(gibbs_step, **statics)
    else:
        v = tuple(jnp.stack([vk] * M) for vk in v1)
        q = jnp.full((M,), 0.9, jnp.float32)
        la = jnp.log(jnp.stack([alphas1] * M))
        da = jnp.stack([alphas1] * M)
        key = jnp.stack(
            [jax.random.fold_in(jax.random.PRNGKey(0), m) for m in range(M)]
        )
        step = functools.partial(gibbs_step_multi, **statics)

    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(v, q, la, key, n):
        def body(_, carry):
            v, q, la, key = carry
            v2, q2, la2, key2, _ll, _nocc, _c = step(
                v, q, la, key, data, f_bg, da, nr
            )
            return v2, q2, la2, key2

        return jax.lax.fori_loop(0, n, body, (v, q, la, key))

    jax.block_until_ready(loop(v, q, la, key, N_TIMED_ITERS))
    dt = min(
        _timed(lambda: jax.block_until_ready(loop(v, q, la, key, N_TIMED_ITERS)))
        for _ in range(3)
    )
    return M * n_win * N_TIMED_ITERS / dt


def measure_anchor() -> float:
    """CPU anchor (reference stand-in): same EM step on the host CPU."""
    import subprocess

    code = (
        "import os; os.environ['JAX_PLATFORMS']='cpu';"
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import sys; sys.path.insert(0, %r);"
        "import bench; w,i = bench.time_em('gather');"
        "print('ANCHOR', w)" % os.path.dirname(os.path.abspath(__file__))
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=1800,
        env={**os.environ, "JAX_PLATFORMS": "cpu",
             "BENCH_CPU_CHILD": "1"},
    )
    for line in out.stdout.splitlines():
        if line.startswith("ANCHOR"):
            return float(line.split()[1])
    raise RuntimeError(f"anchor run failed: {out.stderr[-2000:]}")


def main():
    import jax

    backend = jax.default_backend()
    from bammmotif2_tpu.ops import pallas_em
    from bammmotif2_tpu.refinement import em as em_mod  # noqa: F401

    path = "pallas" if backend == "tpu" and pallas_em.supported(K) else "gather"
    try:
        wps, ips = time_em(path)
    except Exception:
        if path == "pallas":
            path = "gather"
            wps, ips = time_em(path)
        else:
            raise

    # secondary metrics: genome-scale scanning throughput (scores-only
    # kernel) and 3-seed stacked aggregate (the MXU-fill configuration)
    scan_wps = None
    multi3_wps = None
    cgs_wps = None
    cgs3_wps = None
    if backend == "tpu":
        try:
            scan_wps = time_scan()
        except Exception:
            pass
        try:
            multi3_wps = time_em_multi(3)
        except Exception:
            pass
        try:
            cgs_wps = time_cgs(1)
            cgs3_wps = time_cgs(3)
        except Exception:
            pass

    if os.path.exists(ANCHOR_FILE):
        with open(ANCHOR_FILE) as f:
            anchor = json.load(f)["cpu_windows_per_sec"]
    else:
        try:
            anchor = measure_anchor()
            with open(ANCHOR_FILE, "w") as f:
                json.dump(
                    {"cpu_windows_per_sec": anchor,
                     "note": "JAX CPU-backend run of the same order-2 EM "
                             "step on this machine (reference stand-in; "
                             "reference publishes no numbers)"},
                    f, indent=1,
                )
        except Exception:
            anchor = None

    out = {
        "metric": "EM sequence-windows scored/sec/chip (order-2, 10k x 200bp, W=12, both strands)",
        "value": round(wps),
        "unit": "windows/sec",
        "vs_baseline": round(wps / anchor, 2) if anchor else None,
        "iters_per_sec": round(ips, 2),
        "backend": backend,
        "path": path,
    }
    if scan_wps:
        out["scan_windows_per_sec"] = round(scan_wps)
    if multi3_wps:
        out["multi3_agg_windows_per_sec"] = round(multi3_wps)
    if cgs_wps:
        out["cgs_windows_per_sec"] = round(cgs_wps)
    if cgs3_wps:
        out["cgs3_agg_windows_per_sec"] = round(cgs3_wps)
    # end-to-end headline from the last config-4 artifact (full pipeline
    # runs are too long for the bench loop; tools/config4_bench.py
    # refreshes the measurement)
    c4 = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "CONFIG4.json")
    if os.path.exists(c4):
        try:
            with open(c4) as f:
                art = json.load(f)
            out["config4_warm_wall_s"] = art["wall_warm_run_s"]
            out["config4_measured_at"] = art["timestamp"]
        except Exception:
            pass
    print(json.dumps(out))


if __name__ == "__main__":
    main()
