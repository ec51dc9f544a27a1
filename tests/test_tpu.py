"""TPU hardware lane: compiled-Mosaic behavior the CPU suite cannot see.

Run with ``BAMM_TPU_TESTS=1 python -m pytest -m tpu tests/test_tpu.py -q``
on a host with a real TPU (here: one v5e via the axon tunnel).  The
hermetic CPU suite runs every kernel in interpret mode, which misses an
entire bug class that only exists in compiled Mosaic or in TPU XLA's
default flags — both found on hardware in past rounds:

  * bf16 MXU default precision (round 3: kernel dot_generals);
  * ``--xla_allow_excess_precision`` eliding f32->bf16 residual-term
    rounding OUTSIDE the kernel (round 4: _split_terms_xla).

Oracles are computed on the in-process CPU backend (f32 gather path), so
every assertion here is compiled-TPU vs CPU — tolerance 2e-4 on counts
(NT_COUNTS=2 bf16 split at count magnitude ~30), 5e-3 absolute on the
summed log-likelihood (f32 accumulation-order noise across N=60
sequences measures ~2e-3 on hardware; a real precision regression —
e.g. the excess-precision elision — shows up 10x larger).

Timing: first run compiles ~6 shapes through the tunnel (minutes); the
persistent compilation cache (tests/conftest.py) makes reruns fast.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.tpu

jax = pytest.importorskip("jax")

import jax.numpy as jnp  # noqa: E402

from bammmotif2_tpu.ops import encode, escore, pallas_em  # noqa: E402


def _require_tpu():
    if jax.default_backend() != "tpu":
        pytest.skip("no TPU backend available")


@pytest.fixture(scope="module")
def cpu_problem():
    """Problem tensors + gather oracles, all computed on the CPU backend."""
    _require_tpu()
    from tests.test_pallas_em import _setup

    cpu = jax.devices("cpu")[0]
    out = {}
    with jax.default_device(cpu):
        for K, W in ((0, 8), (2, 12), (3, 8), (4, 8), (5, 12)):
            v, data, motif = _setup(K, W)
            out[(K, W)] = (v, data, motif)
    return out


def _oracle(lut, data, q, K, W):
    cpu = jax.devices("cpu")[0]
    R = encode.num_rows(4, K)
    with jax.default_device(cpu):
        sc, mask = escore.window_scores(lut, data["cidx"], data["lens"], W)
        r, _r0, ll = escore.zoops_posterior(sc, mask, q)
        C = escore.mstep_counts(r, data["cidx"], R, W)
    return np.asarray(sc), np.asarray(mask), np.asarray(C), float(ll)


def _put(x):
    return jax.device_put(np.asarray(x), jax.devices()[0])


class TestCompiledKernelParity:
    @pytest.mark.parametrize("K,W", [(0, 8), (2, 12), (3, 8), (4, 8), (5, 12)])
    def test_em_counts_matches_cpu_oracle(self, cpu_problem, K, W):
        v, data, motif = cpu_problem[(K, W)]
        from bammmotif2_tpu.models.motif import log_odds_lut

        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            lut = log_odds_lut(v, data["bg_flat"])
        q = jnp.float32(0.7)
        _sc, _m, C_o, ll_o = _oracle(lut, data, q, K, W)

        R = encode.num_rows(4, K)
        C, ll = pallas_em.em_counts(
            _put(lut), _put(data["cidx"]), _put(data["lens"]), q,
            A=4, K=K, W=W, R=R,
        )
        np.testing.assert_allclose(np.asarray(C), C_o, atol=2e-4)
        assert abs(float(ll) - ll_o) < 5e-3

    def test_seed_stacked_matches_cpu_oracle(self, cpu_problem):
        from tests.test_pallas_em import TestSeedStackedKernel

        K, W, M = 2, 12, 3
        v, data, motif = cpu_problem[(K, W)]
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            luts = TestSeedStackedKernel._luts(v, data, M)
        qs = np.random.default_rng(4).uniform(0.3, 0.95, M).astype(np.float32)
        R = encode.num_rows(4, K)
        C_m, ll_m = pallas_em.em_counts_multi(
            _put(luts), _put(data["cidx"]), _put(data["lens"]), _put(qs),
            A=4, K=K, W=W, R=R,
        )
        for m in range(M):
            _sc, _msk, C_o, ll_o = _oracle(luts[m], data, qs[m], K, W)
            np.testing.assert_allclose(np.asarray(C_m[m]), C_o, atol=2e-4)
            assert abs(float(ll_m[m]) - ll_o) < 5e-3

    def test_window_scores_matches_cpu_oracle(self, cpu_problem):
        K, W = 2, 12
        v, data, motif = cpu_problem[(K, W)]
        from bammmotif2_tpu.models.motif import log_odds_lut

        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            lut = log_odds_lut(v, data["bg_flat"])
        sc_o, mask_o, _C, _ll = _oracle(lut, data, jnp.float32(0.7), K, W)
        sc, mask = pallas_em.window_scores(
            _put(lut), _put(data["cidx"]), _put(data["lens"]), A=4, K=K, W=W
        )
        np.testing.assert_array_equal(np.asarray(mask), mask_o)
        valid = mask_o[None].repeat(2, 0)
        np.testing.assert_allclose(
            np.asarray(sc)[valid], sc_o[valid], atol=1e-4
        )

    def test_counts_from_r_matches_cpu_oracle(self, cpu_problem):
        K, W = 2, 12
        v, data, motif = cpu_problem[(K, W)]
        cidx, lens = data["cidx"], data["lens"]
        S, N, L = cidx.shape
        n_win = L - W + 1
        R = encode.num_rows(4, K)
        rng = np.random.default_rng(1)
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            mask = np.asarray(escore.window_mask(lens, n_win, W))
            r = np.zeros((S, N, n_win), np.float32)
            for n in range(N):
                valid = np.nonzero(mask[n])[0]
                if len(valid) and rng.random() < 0.8:
                    r[rng.integers(0, S), n, rng.choice(valid)] = 1.0
            C_o = np.asarray(escore.mstep_counts(jnp.asarray(r), cidx, R, W))
        r_snl = np.pad(r, ((0, 0), (0, 0), (0, L - n_win)))
        C = pallas_em.counts_from_r(
            _put(r_snl), _put(cidx), A=4, K=K, W=W, R=R
        )
        np.testing.assert_allclose(np.asarray(C), C_o, atol=2e-4)


class TestShardedKernelOnChip:
    def test_pallas_shard_single_device_mesh(self, cpu_problem):
        """shard_map + psum wrapping the compiled kernel on a real-device
        mesh (1 chip here; the N-chip program is the same code)."""
        from jax.sharding import Mesh

        from bammmotif2_tpu.refinement.em import em_step

        K, W = 2, 12
        v, data, motif = cpu_problem[(K, W)]
        mesh = Mesh(np.array(jax.devices()[:1]), ("data",))
        dev_data = {k: _put(val) for k, val in data.items()}
        args = (
            tuple(_put(np.asarray(vk, np.float32)) for vk in v),
            jnp.float32(0.7),
            dev_data,
            _put(np.asarray(motif.alphas, np.float32)),
            _put(np.asarray(motif.f_bg, np.float32)),
            jnp.float32(dev_data["lens"].shape[0]),
        )
        kw = dict(A=4, K=K, W=W, optimize_q=True)
        v_s, q_s, ll_s, vd_s = em_step(*args, path="pallas_shard", mesh=mesh, **kw)
        v_p, q_p, ll_p, vd_p = em_step(*args, path="pallas", **kw)
        np.testing.assert_allclose(float(ll_s), float(ll_p), rtol=1e-6)
        for a, b in zip(v_s, v_p):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


class TestBenchSmoke:
    def test_order2_throughput_floor(self):
        """Device-resident 30-iter loop must stay above 0.9 B windows/s —
        catches Mosaic/layout perf regressions, not just correctness."""
        _require_tpu()
        import bench

        wps, ips = bench.time_em("pallas")
        assert wps > 0.9e9, f"order-2 EM at {wps/1e9:.2f} B w/s (< 0.9 floor)"


class TestCGSOnChip:
    def test_cgs_compiled_recovers_motif(self):
        """Compiled seed-stacked CGS path (window_scores_multi +
        counts_from_r_multi inside the scan) on real hardware: the sampler
        must still recover the planted consensus.  (Sampling is not
        bit-comparable across backends — tiny f32 score differences flip
        draws — so this is a behavioral, not numerical, assertion.)"""
        _require_tpu()
        import sys

        sys.path.insert(0, "tests")
        from test_em import planted_set

        from bammmotif2_tpu.models import seeds as seeds_mod
        from bammmotif2_tpu.models.background import BackgroundModel
        from bammmotif2_tpu.refinement.gibbs import run_gibbs_multi
        from bammmotif2_tpu.utils.config import Params

        motif_str = "TGACTCAG"
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            sset = planted_set(n=200, l=80, motif=motif_str, q=0.85, noise=0.05)
            bg = BackgroundModel.from_sequence_set(sset, order=2)
            seeds = [
                seeds_mod.motif_from_pwm(
                    seeds_mod.iupac_to_pwm(motif_str, soft=s), K=2,
                    f_bg=sset.base_frequencies(),
                )
                for s in (0.55, 0.7)
            ]
        results = run_gibbs_multi(
            seeds, bg, sset, Params(CGS=True, q=0.5, maxCGSIterations=20, seed=3)
        )
        assert len(results) == 2
        for m in seeds:
            consensus = "".join("ACGT"[i] for i in m.v[0].argmax(axis=0))
            assert consensus == motif_str, consensus
            assert np.all(m.alphas > 0)


@pytest.mark.tpu
class TestFusedFDROnChip:
    def test_fused_matches_per_seed_on_hardware(self):
        """Fused group FDR vs the per-seed path with the COMPILED Pallas
        kernels — the CPU suite can only pin this parity on the gather
        path, and compiled-Mosaic behavior (bf16 defaults, layouts) is
        exactly the bug class this lane exists for."""
        import sys

        sys.path.insert(0, "tests")
        from test_em import planted_set

        from bammmotif2_tpu.evaluation.fdr import (
            evaluate_motif, evaluate_motifs,
        )
        from bammmotif2_tpu.models import seeds as seeds_mod
        from bammmotif2_tpu.models.background import BackgroundModel
        from bammmotif2_tpu.utils.config import Params

        motif_str = "TGACTCAG"
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            sset = planted_set(n=120, l=60, motif=motif_str, q=0.85,
                               noise=0.05)
            bg = BackgroundModel.from_sequence_set(sset, order=2)

        def mk(soft):
            return seeds_mod.motif_from_pwm(
                seeds_mod.iupac_to_pwm(motif_str, soft=soft), K=2,
                f_bg=sset.base_frequencies(),
            )

        params = Params(FDR=True, cvFold=2, mFold=2, q=0.5,
                        maxEMIterations=10)
        ref = [evaluate_motif(mk(s), bg, sset, params) for s in (0.55, 0.7)]
        new = evaluate_motifs([mk(0.55), mk(0.7)], bg, sset, params)
        for i, (r, n) in enumerate(zip(ref, new)):
            for k in ("score", "tp", "fp", "pvalue"):
                np.testing.assert_allclose(
                    r.zoops[k], n.zoops[k], rtol=1e-3, atol=1e-4,
                    err_msg=f"zoops {k} motif {i}",
                )
                np.testing.assert_allclose(
                    r.mops[k], n.mops[k], rtol=1e-3, atol=1e-4,
                    err_msg=f"mops {k} motif {i}",
                )
