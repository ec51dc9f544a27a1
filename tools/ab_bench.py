"""A/B kernel benchmark through bench.py's stable em_step methodology.

Usage:  JAX_PLATFORMS=axon,cpu python ab_bench.py K path [path...]
e.g.    python ab_bench.py 3 pallas gather
(the retired flat kernel lives in tools/pallas_flat.py and is no longer
an em_step path)

Data prep runs on the CPU backend (the axon tunnel makes eager host prep
pathologically slow); em_step timing uses the chained-state host loop that
bench.py uses, which has been stable across rounds.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_SEQS = 10_000
SEQ_LEN = 200
W = 12
N_TIMED = 30


def build_problem_cpu(K):
    import jax
    import jax.numpy as jnp

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
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
        sset = SequenceSet(codes=codes, lens=lens,
                           headers=[f"s{i}" for i in range(N_SEQS)],
                           alphabet=alphabet)
        bg = BackgroundModel.from_sequence_set(sset, order=2, alpha=10.0,
                                               ss=False)
        pwm = np.full((W, 4), 0.1, np.float64)
        pwm[np.arange(W), motif_codes] = 0.7
        motif = seeds_mod.motif_from_pwm(pwm, K=K, f_bg=sset.base_frequencies())
        data = prepare_data(sset, bg, K, ss=False)
        v = tuple(jnp.asarray(vk, jnp.float32) for vk in motif.v)
        alphas = jnp.asarray(motif.alphas, jnp.float32)
        f_bg = jnp.asarray(motif.f_bg, jnp.float32)

    # move to the default (TPU) device
    dev = jax.devices()[0]
    data = {k: jax.device_put(np.asarray(val), dev) for k, val in data.items()}
    v = tuple(jax.device_put(np.asarray(vk), dev) for vk in v)
    alphas = jax.device_put(np.asarray(alphas), dev)
    f_bg = jax.device_put(np.asarray(f_bg), dev)
    return v, data, alphas, f_bg


def time_em(K, path, problem):
    """One timed 30-iter chained loop; returns a (ms_per_iter, final
    log-likelihood) tuple (see main: the first loops per executable
    through the axon tunnel are polluted by remote warm-up, so callers
    interleave rounds and take the min of the ms values)."""
    import jax
    import jax.numpy as jnp

    from bammmotif2_tpu.refinement.em import em_step

    v, data, alphas, f_bg = problem
    q = jnp.asarray(0.9, jnp.float32)
    nr = jnp.asarray(float(N_SEQS), jnp.float32)

    def step(v, q):
        return em_step(v, q, data, alphas, f_bg, nr,
                       A=4, K=K, W=W, optimize_q=True, path=path)

    v1, q1, ll, vd = step(v, q)
    jax.block_until_ready((v1, q1))
    t0 = time.perf_counter()
    for _ in range(N_TIMED):
        v1, q1, ll, vd = step(v1, q1)
    jax.block_until_ready((v1, q1, ll, vd))
    dt = (time.perf_counter() - t0) / N_TIMED
    return dt * 1e3, float(ll)


def time_em_device_loop(K, path, problem, n_iters=N_TIMED):
    """Device-resident timing: all n_iters chained em_steps inside ONE
    jitted lax.fori_loop, so axon-tunnel dispatch latency (which can be
    10x the kernel time and swings 2x round-to-round) is paid once, not
    per iteration.  Returns ms/iter."""
    import functools

    import jax
    import jax.numpy as jnp

    from bammmotif2_tpu.refinement.em import em_step

    v, data, alphas, f_bg = problem
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

    q = jnp.asarray(0.9, jnp.float32)
    jax.block_until_ready(loop(v, q, n_iters))  # compile + warm
    t0 = time.perf_counter()
    out = loop(v, q, n_iters)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n_iters * 1e3


def save_problem(K, path):
    """Stage 1 (run under JAX_PLATFORMS=cpu): build + savez."""
    import jax
    jax.config.update("jax_platforms", "cpu")  # sitecustomize bakes axon
    v, data, alphas, f_bg = build_problem_cpu(K)
    out = {f"v{k}": np.asarray(vk) for k, vk in enumerate(v)}
    out.update({k: np.asarray(val) for k, val in data.items()})
    out["alphas"] = np.asarray(alphas)
    out["f_bg"] = np.asarray(f_bg)
    out["nv"] = np.asarray(len(v))
    np.savez(path, **out)


def load_problem(path):
    import jax

    z = np.load(path)
    dev = jax.devices()[0]
    nv = int(z["nv"])
    v = tuple(jax.device_put(z[f"v{k}"], dev) for k in range(nv))
    data = {k: jax.device_put(z[k], dev)
            for k in ("cidx", "lens", "bg_flat")}
    alphas = jax.device_put(z["alphas"], dev)
    f_bg = jax.device_put(z["f_bg"], dev)
    return v, data, alphas, f_bg


def main():
    K = int(sys.argv[1])
    paths = sys.argv[2:] or ["pallas", "gather"]
    npz = f"/tmp/bamm_ab_{K}_{N_SEQS}_{SEQ_LEN}_{W}.npz"
    import os
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        save_problem(K, npz)
        print("saved", npz, flush=True)
        return
    if not os.path.exists(npz):
        import subprocess
        subprocess.run(
            [sys.executable, __file__, str(K)],
            env={**os.environ, "JAX_PLATFORMS": "cpu"}, check=True)
    problem = load_problem(npz)
    n_win = 2 * N_SEQS * (SEQ_LEN - W + 1)
    device_loop = os.environ.get("AB_DEVICE_LOOP", "1") == "1"
    best = {}
    for rnd in range(3):
        for path in paths:
            if device_loop:
                ms = time_em_device_loop(K, path, problem)
            else:
                ms, ll = time_em(K, path, problem)
            best[path] = min(best.get(path, 1e30), ms)
            print(f"  round {rnd} K={K} {path:8s}: {ms:8.3f} ms/iter",
                  flush=True)
    for path in paths:
        dt = best[path] / 1e3
        print(f"K={K} {path:8s}: {best[path]:8.3f} ms/iter "
              f"{n_win/dt/1e6:10.1f} Mw/s", flush=True)


if __name__ == "__main__":
    main()
