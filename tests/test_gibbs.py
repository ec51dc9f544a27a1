"""Collapsed Gibbs sampling tests."""

import numpy as np
import pytest

from bammmotif2_tpu.models import seeds as seeds_mod
from bammmotif2_tpu.models.background import BackgroundModel
from bammmotif2_tpu.refinement.gibbs import run_gibbs
from bammmotif2_tpu.utils.config import Params

from tests.test_em import planted_set

MOTIF = "TGACTCAG"


@pytest.fixture(scope="module")
def planted():
    sset = planted_set(n=300, l=100, motif=MOTIF, q=0.8, noise=0.1)
    bg = BackgroundModel.from_sequence_set(sset, order=2)
    return sset, bg


def seed_motif(sset, K=2, soft=0.6):
    return seeds_mod.motif_from_pwm(
        seeds_mod.iupac_to_pwm(MOTIF, soft=soft), K=K, f_bg=sset.base_frequencies()
    )


class TestGibbs:
    def test_recovers_planted_motif(self, planted):
        sset, bg = planted
        m = seed_motif(sset)
        params = Params(CGS=True, q=0.5, maxCGSIterations=30, seed=0)
        res = run_gibbs(m, bg, sset, params)
        consensus = "".join("ACGT"[i] for i in m.v[0].argmax(axis=0))
        assert consensus == MOTIF
        assert np.isfinite(res.ll)
        # late iterations should beat the early ones on average
        ll = np.array(res.ll_history)
        assert ll[-5:].mean() > ll[:5].mean()

    def test_alphas_learned_and_positive(self, planted):
        sset, bg = planted
        m = seed_motif(sset)
        a0 = m.alphas.copy()
        run_gibbs(m, bg, sset, Params(CGS=True, q=0.5, maxCGSIterations=15, seed=1))
        assert m.alphas.shape == a0.shape
        assert np.all(m.alphas > 0)
        assert not np.allclose(m.alphas, a0)  # something was learned

    def test_no_alpha_optimization_flag(self, planted):
        sset, bg = planted
        m = seed_motif(sset)
        a0 = m.alphas.copy()
        run_gibbs(
            m, bg, sset,
            Params(CGS=True, maxCGSIterations=5, noAlphaOptimization=True, seed=2),
        )
        np.testing.assert_allclose(m.alphas, a0)

    def test_q_sampled_near_plant_rate(self, planted):
        sset, bg = planted
        m = seed_motif(sset)
        res = run_gibbs(m, bg, sset, Params(CGS=True, q=0.3, maxCGSIterations=30, seed=3))
        assert 0.5 < res.q <= 1.0

    def test_deterministic_given_seed(self, planted):
        sset, bg = planted
        m1, m2 = seed_motif(sset), seed_motif(sset)
        p = Params(CGS=True, maxCGSIterations=5, seed=7)
        run_gibbs(m1, bg, sset, p)
        run_gibbs(m2, bg, sset, p)
        for a, b in zip(m1.v, m2.v):
            np.testing.assert_allclose(a, b)

    def test_rows_normalized(self, planted):
        sset, bg = planted
        m = seed_motif(sset)
        run_gibbs(m, bg, sset, Params(CGS=True, maxCGSIterations=8, seed=4))
        for k, vk in enumerate(m.v):
            sums = vk.reshape(-1, 4, m.W).sum(axis=1)
            np.testing.assert_allclose(sums, 1.0, atol=1e-4, err_msg=f"order {k}")
