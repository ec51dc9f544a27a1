"""Pallas fused EM kernel: equivalence with the XLA gather path.

Runs the kernel in interpreter mode on CPU; the compiled path is exercised
on real TPU hardware by bench.py and the driver.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from bammmotif2_tpu.models import seeds as seeds_mod
from bammmotif2_tpu.models.background import BackgroundModel
from bammmotif2_tpu.ops import encode
from bammmotif2_tpu.refinement.em import em_step, prepare_data
from bammmotif2_tpu.utils.fasta import SequenceSet

from tests.test_em import planted_set

MOTIF = "TGACTCAG"


def naive_cidx_check(sset, K):
    cidx, _ = encode.strand_indices(sset, K, ss=False)
    qidx = encode.strand_base5_indices(sset, K, ss=False)
    map5 = encode.map_base5_to_combined(4, K)
    np.testing.assert_array_equal(np.asarray(cidx), map5[np.asarray(qidx)])


class TestBase5Encoding:
    @pytest.mark.parametrize("K", [0, 1, 2, 3])
    def test_map5_consistent_with_cidx(self, K):
        # with ambiguous bases and ragged lengths
        sset = SequenceSet.from_sequences(["ACGTNACGTACG", "TTNAC", "GGGGGGGG"])
        naive_cidx_check(sset, K)

    def test_map5_sentinel(self):
        map5 = encode.map_base5_to_combined(4, 2)
        R = encode.num_rows(4, 2)
        # current base invalid -> sentinel regardless of context
        assert map5[4] == R
        assert map5[4 + 5 * 2 + 25 * 3] == R
        # full context -> order-2 block
        off = encode.order_offsets(4, 2)
        c = 1 + 5 * 2 + 25 * 3  # base C, prev G, prevprev T
        assert map5[c] == off[2] + (3 * 16 + 2 * 4 + 1)


def _setup(K, W, n=60, l=50, ragged=True):
    rng = np.random.default_rng(0)
    seqs = []
    for i in range(n):
        length = l if not ragged else int(rng.integers(W + 2, l + 1))
        s = rng.choice(list("ACGT"), size=length)
        if i % 3 == 0 and length > 10:
            s[5] = "N"  # sprinkle ambiguity
        seqs.append("".join(s))
    sset = SequenceSet.from_sequences(seqs)
    bg = BackgroundModel.from_sequence_set(sset, order=min(2, K + 1))
    motif = seeds_mod.motif_from_pwm(
        seeds_mod.iupac_to_pwm(MOTIF[:W].ljust(W, "N"), soft=0.6),
        K=K,
        f_bg=sset.base_frequencies(),
    )
    data = prepare_data(sset, bg, K, ss=False)
    v = tuple(jnp.asarray(vk, jnp.float32) for vk in motif.v)
    return v, data, motif


class TestPallasKernelEquivalence:
    @pytest.mark.parametrize(
        "K,W", [(0, 8), (1, 8), (2, 8), (3, 6), (4, 8), (5, 6)]
    )
    def test_matches_gather_path(self, K, W):
        v, data, motif = _setup(K, W)
        alphas = jnp.asarray(motif.alphas, jnp.float32)
        f_bg = jnp.asarray(motif.f_bg, jnp.float32)
        q = jnp.asarray(0.7, jnp.float32)

        kw = dict(A=4, K=K, W=W, optimize_q=True)
        vg, qg, llg, vdg = em_step(v, q, data, alphas, f_bg, path="gather", **kw)
        vp, qp, llp, vdp = em_step(
            v, q, data, alphas, f_bg, path="pallas_interpret", **kw
        )
        np.testing.assert_allclose(float(llg), float(llp), rtol=1e-5)
        np.testing.assert_allclose(float(qg), float(qp), rtol=1e-5)
        for a, b in zip(vg, vp):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_short_sequences_and_padding(self):
        # sequences shorter than W must put all mass on r0 in both paths
        K, W = 2, 8
        sset = SequenceSet.from_sequences(
            ["ACGTACGTACGTACGT", "ACG", "ACGTACGTA"]  # one too short
        )
        bg = BackgroundModel.from_sequence_set(sset, order=2)
        motif = seeds_mod.motif_from_pwm(
            seeds_mod.iupac_to_pwm(MOTIF, soft=0.6), K=K, f_bg=sset.base_frequencies()
        )
        data = prepare_data(sset, bg, K, ss=False)
        v = tuple(jnp.asarray(vk, jnp.float32) for vk in motif.v)
        alphas = jnp.asarray(motif.alphas, jnp.float32)
        f_bg = jnp.asarray(motif.f_bg, jnp.float32)
        kw = dict(A=4, K=K, W=W, optimize_q=False)
        _, _, llg, _ = em_step(v, 0.9, data, alphas, f_bg, path="gather", **kw)
        _, _, llp, _ = em_step(v, 0.9, data, alphas, f_bg, path="pallas_interpret", **kw)
        np.testing.assert_allclose(float(llg), float(llp), rtol=1e-5)


class TestPallasCountsFromR:
    @pytest.mark.parametrize("K,W", [(0, 8), (2, 8), (4, 6)])
    def test_matches_segment_sum_counts(self, K, W):
        from bammmotif2_tpu.ops import escore, pallas_em

        v, data, motif = _setup(K, W)
        cidx, lens = data["cidx"], data["lens"]
        S, N, L = cidx.shape
        n_win = L - W + 1
        R = encode.num_rows(4, K)
        # hard 0/1 occupancy at a valid window per sequence (CGS shape)
        rng = np.random.default_rng(1)
        mask = np.asarray(escore.window_mask(lens, n_win, W))
        r = np.zeros((S, N, n_win), np.float32)
        for n in range(N):
            valid = np.nonzero(mask[n])[0]
            if len(valid) and rng.random() < 0.8:
                r[rng.integers(0, S), n, rng.choice(valid)] = 1.0
        r = jnp.asarray(r)
        C_ref = escore.mstep_counts(r, cidx, R, W)
        r_snl = jnp.pad(r, ((0, 0), (0, 0), (0, L - n_win)))
        C_pal = pallas_em.counts_from_r(
            r_snl, data["cidx"],
            A=4, K=K, W=W, R=R, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(C_pal), np.asarray(C_ref), atol=1e-5
        )


class TestPallasWindowScores:
    @pytest.mark.parametrize("K,W", [(0, 8), (2, 8), (3, 6), (4, 6), (5, 6)])
    def test_matches_gather_scores(self, K, W):
        from bammmotif2_tpu.models.motif import log_odds_lut
        from bammmotif2_tpu.ops import escore, pallas_em

        v, data, motif = _setup(K, W)
        s_flat = log_odds_lut(v, data["bg_flat"])
        sc_g, m_g = escore.window_scores(s_flat, data["cidx"], data["lens"], W)
        sc_p, m_p = pallas_em.window_scores(
            s_flat, data["cidx"], data["lens"],
            A=4, K=K, W=W, interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(m_g), np.asarray(m_p))
        np.testing.assert_allclose(
            np.asarray(sc_g), np.asarray(sc_p), atol=1e-5
        )


class TestSeedStackedKernel:
    """em_counts_multi: M seeds stacked into ONE kernel (the MXU-fill
    lever — LUTs ride the matmul output rows, one shared one-hot)."""

    @staticmethod
    def _luts(v, data, M):
        from bammmotif2_tpu.models.motif import log_odds_lut

        base = np.asarray(log_odds_lut(v, data["bg_flat"]))
        rng = np.random.default_rng(3)
        luts = np.stack([
            base if m == 0
            else base * rng.uniform(0.6, 1.4) + rng.normal(0, 0.05, base.shape)
            for m in range(M)
        ])
        luts[:, -1, :] = 0.0  # sentinel row scores zero (log_odds_lut contract)
        return jnp.asarray(luts, jnp.float32)

    @pytest.mark.parametrize(
        "K,W,M", [(0, 8, 3), (2, 8, 3), (2, 12, 7), (3, 6, 2), (4, 6, 2)]
    )
    def test_multi_matches_gather_oracle(self, K, W, M):
        from bammmotif2_tpu.ops import escore, pallas_em

        v, data, motif = _setup(K, W)
        R = encode.num_rows(4, K)
        luts = self._luts(v, data, M)
        qs = jnp.asarray(
            np.random.default_rng(4).uniform(0.3, 0.95, M), jnp.float32
        )
        C_m, ll_m = pallas_em.em_counts_multi(
            luts, data["cidx"], data["lens"], qs,
            A=4, K=K, W=W, R=R, interpret=True,
        )
        assert C_m.shape == (M, R + 1, W) and ll_m.shape == (M,)
        for m in range(M):
            scores, mask = escore.window_scores(
                luts[m], data["cidx"], data["lens"], W
            )
            r, _r0, ll = escore.zoops_posterior(scores, mask, qs[m])
            C = escore.mstep_counts(r, data["cidx"], R, W)
            # atol 1e-4: the NT_COUNTS=2 bf16 split carries ~5e-7 relative
            # error and these perturbed-LUT counts reach magnitude ~30
            np.testing.assert_allclose(
                np.asarray(C_m[m]), np.asarray(C), atol=1e-4
            )
            np.testing.assert_allclose(float(ll_m[m]), float(ll), rtol=3e-5)

    def test_seed_chunking_matches_unchunked(self, monkeypatch):
        """_stacked_em_counts splits seed groups beyond max_seeds into
        static chunks with identical results."""
        from bammmotif2_tpu.ops import pallas_em
        from bammmotif2_tpu.refinement import multi as multi_mod

        K, W, M = 2, 8, 5
        v, data, motif = _setup(K, W)
        R = encode.num_rows(4, K)
        luts = self._luts(v, data, M)
        qs = jnp.asarray(
            np.random.default_rng(5).uniform(0.3, 0.95, M), jnp.float32
        )
        C_a, ll_a = pallas_em.em_counts_multi(
            luts, data["cidx"], data["lens"], qs,
            A=4, K=K, W=W, R=R, interpret=True,
        )
        monkeypatch.setattr(pallas_em, "max_seeds", lambda *a, **k: 2)
        C_b, ll_b = multi_mod._stacked_em_counts(
            luts, data["cidx"], data["lens"], qs,
            A=4, K=K, W=W, R=R, interpret=True,
        )
        # chunked blocks partition sequences differently -> f32 accumulation
        # order differs slightly
        np.testing.assert_allclose(np.asarray(C_a), np.asarray(C_b), atol=2e-5)
        np.testing.assert_allclose(np.asarray(ll_a), np.asarray(ll_b), rtol=1e-5)

    def test_batched_optimize_stacked_matches_gather(self):
        """The multi-seed EM convergence loop on the stacked-kernel path
        agrees with the gather path for a fixed iteration budget."""
        from bammmotif2_tpu.refinement.multi import _batched_optimize

        K, W, M = 2, 8, 3
        v1, data, motif = _setup(K, W)
        rng = np.random.default_rng(6)
        v = tuple(
            jnp.asarray(
                np.stack([
                    np.asarray(vk) if m == 0 else
                    np.clip(np.asarray(vk) * rng.uniform(0.8, 1.2, vk.shape), 1e-4, None)
                    for m in range(M)
                ]),
                jnp.float32,
            )
            for vk in v1
        )
        q = jnp.asarray(rng.uniform(0.4, 0.9, M), jnp.float32)
        alphas = jnp.asarray(
            np.stack([np.asarray(motif.alphas)] * M), jnp.float32
        )
        f_bg = jnp.asarray(motif.f_bg, jnp.float32)
        nr = jnp.asarray(float(data["lens"].shape[0]), jnp.float32)
        eps = jnp.float32(0.0)  # run the fixed 5-iteration budget on both

        outs = {}
        for path in ("gather", "pallas_interpret"):
            loop, _ = _batched_optimize(4, K, W, True, path, 5, mesh=None)
            outs[path] = loop(v, q, data, alphas, f_bg, nr, eps)
        vg, qg, llg, _, itg, _h = outs["gather"]
        vp, qp, llp, _, itp, _h2 = outs["pallas_interpret"]
        np.testing.assert_array_equal(np.asarray(itg), np.asarray(itp))
        np.testing.assert_allclose(np.asarray(qg), np.asarray(qp), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(llg), np.asarray(llp), rtol=1e-5)
        for a, b in zip(vg, vp):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)

    def test_unstacked_term_dots_match(self, monkeypatch):
        """The large-Wt path (one dot per bf16 term, TERM_STACK_MAX_WT
        exceeded — production geometry at K=5, W=12) matches the
        term-stacked single-dot path."""
        from bammmotif2_tpu.ops import pallas_em

        K, W, M = 2, 8, 2
        v, data, motif = _setup(K, W)
        R = encode.num_rows(4, K)
        luts = self._luts(v, data, M)
        qs = jnp.asarray([0.6, 0.8], jnp.float32)
        args = (luts, data["cidx"], data["lens"], qs)
        kw = dict(A=4, K=K, W=W, R=R, interpret=True)
        C_a, ll_a = pallas_em.em_counts_multi(*args, **kw)
        pallas_em.em_counts_multi._clear_cache()  # geometry is trace-time
        monkeypatch.setattr(pallas_em, "TERM_STACK_MAX_WT", 0)
        C_b, ll_b = pallas_em.em_counts_multi(*args, **kw)
        pallas_em.em_counts_multi._clear_cache()  # drop the patched trace
        np.testing.assert_allclose(np.asarray(C_a), np.asarray(C_b), atol=2e-5)
        np.testing.assert_allclose(np.asarray(ll_a), np.asarray(ll_b), rtol=1e-5)

    @pytest.mark.parametrize("K,W,M", [(0, 8, 3), (2, 8, 3), (3, 6, 2)])
    def test_window_scores_multi_matches_per_seed(self, K, W, M):
        from bammmotif2_tpu.ops import escore, pallas_em

        v, data, motif = _setup(K, W)
        luts = self._luts(v, data, M)
        sc_m, mask_m = pallas_em.window_scores_multi(
            luts, data["cidx"], data["lens"], A=4, K=K, W=W, interpret=True
        )
        for m in range(M):
            sc_g, mask_g = escore.window_scores(
                luts[m], data["cidx"], data["lens"], W
            )
            np.testing.assert_array_equal(np.asarray(mask_m), np.asarray(mask_g))
            np.testing.assert_allclose(
                np.asarray(sc_m[m]), np.asarray(sc_g), atol=1e-5
            )

    @pytest.mark.parametrize("K,W,M", [(0, 8, 3), (2, 8, 3), (4, 6, 2)])
    def test_counts_from_r_multi_matches_per_seed(self, K, W, M):
        from bammmotif2_tpu.ops import escore, pallas_em

        v, data, motif = _setup(K, W)
        cidx, lens = data["cidx"], data["lens"]
        S, N, L = cidx.shape
        n_win = L - W + 1
        R = encode.num_rows(4, K)
        rng = np.random.default_rng(2)
        mask = np.asarray(escore.window_mask(lens, n_win, W))
        r = np.zeros((M, S, N, n_win), np.float32)
        for m in range(M):
            for n in range(N):
                valid = np.nonzero(mask[n])[0]
                if len(valid) and rng.random() < 0.8:
                    r[m, rng.integers(0, S), n, rng.choice(valid)] = 1.0
        r_msnl = jnp.pad(
            jnp.asarray(r), ((0, 0), (0, 0), (0, 0), (0, L - n_win))
        )
        C_m = pallas_em.counts_from_r_multi(
            r_msnl, cidx, A=4, K=K, W=W, R=R, interpret=True
        )
        assert C_m.shape == (M, R + 1, W)
        for m in range(M):
            C_ref = escore.mstep_counts(jnp.asarray(r[m]), cidx, R, W)
            np.testing.assert_allclose(
                np.asarray(C_m[m]), np.asarray(C_ref), atol=1e-5
            )

    def test_single_strand_matches_gather(self):
        """--ss geometry (S=1: one strand segment per kernel row)."""
        from bammmotif2_tpu.models.background import BackgroundModel
        from bammmotif2_tpu.ops import escore, pallas_em
        from bammmotif2_tpu.refinement.em import prepare_data

        K, W = 2, 8
        rng = np.random.default_rng(7)
        seqs = ["".join(rng.choice(list("ACGT"), size=int(rng.integers(W + 2, 50))))
                for _ in range(40)]
        sset = SequenceSet.from_sequences(seqs)
        bg = BackgroundModel.from_sequence_set(sset, order=2, ss=True)
        motif = seeds_mod.motif_from_pwm(
            seeds_mod.iupac_to_pwm(MOTIF, soft=0.6), K=K,
            f_bg=sset.base_frequencies(),
        )
        data = prepare_data(sset, bg, K, ss=True)
        assert data["cidx"].shape[0] == 1  # single strand
        from bammmotif2_tpu.models.motif import log_odds_lut

        lut = log_odds_lut(
            tuple(jnp.asarray(vk, jnp.float32) for vk in motif.v),
            data["bg_flat"],
        )
        q = jnp.float32(0.7)
        R = encode.num_rows(4, K)
        sc, mask = escore.window_scores(lut, data["cidx"], data["lens"], W)
        r, _r0, ll_o = escore.zoops_posterior(sc, mask, q)
        C_o = escore.mstep_counts(r, data["cidx"], R, W)
        C, ll = pallas_em.em_counts(
            lut, data["cidx"], data["lens"], q,
            A=4, K=K, W=W, R=R, interpret=True,
        )
        np.testing.assert_allclose(np.asarray(C), np.asarray(C_o), atol=1e-5)
        np.testing.assert_allclose(float(ll), float(ll_o), rtol=1e-5)

    def test_extended_alphabet_matches_gather(self):
        """A=5 (METHYLC) kernel geometry: Q spans two lane-tiles even at
        K=2, exercising the hi/lo split with a non-power-of-two alphabet."""
        from bammmotif2_tpu.models.background import BackgroundModel
        from bammmotif2_tpu.models.motif import log_odds_lut
        from bammmotif2_tpu.ops import escore, pallas_em
        from bammmotif2_tpu.refinement.em import prepare_data
        from bammmotif2_tpu.utils.alphabet import Alphabet

        alpha = Alphabet.from_type("METHYLC")
        A, K, W = alpha.size, 2, 8
        rng = np.random.default_rng(9)
        seqs = [
            "".join(rng.choice(list("ACGTM"), size=int(rng.integers(W + 2, 50)),
                               p=[0.24, 0.24, 0.24, 0.24, 0.04]))
            for _ in range(40)
        ]
        sset = SequenceSet.from_sequences(seqs, alphabet=alpha)
        bg = BackgroundModel.from_sequence_set(sset, order=2, ss=True)
        pwm = np.full((W, A), 1.0 / A)
        motif = seeds_mod.motif_from_pwm(
            pwm, K=K, f_bg=sset.base_frequencies(), alphabet=alpha
        )
        data = prepare_data(sset, bg, K, ss=True)
        lut = log_odds_lut(
            tuple(jnp.asarray(vk, jnp.float32) for vk in motif.v),
            data["bg_flat"],
        )
        lut = lut + jnp.asarray(
            np.random.default_rng(1).normal(0, 0.3, lut.shape), jnp.float32
        ).at[-1].set(0.0)  # perturb for a non-trivial posterior; sentinel 0
        q = jnp.float32(0.6)
        R = encode.num_rows(A, K)
        assert pallas_em.supported(K, A)
        sc, mask = escore.window_scores(lut, data["cidx"], data["lens"], W)
        r, _r0, ll_o = escore.zoops_posterior(sc, mask, q)
        C_o = escore.mstep_counts(r, data["cidx"], R, W)
        C, ll = pallas_em.em_counts(
            lut, data["cidx"], data["lens"], q,
            A=A, K=K, W=W, R=R, interpret=True,
        )
        np.testing.assert_allclose(np.asarray(C), np.asarray(C_o), atol=2e-5)
        np.testing.assert_allclose(float(ll), float(ll_o), rtol=1e-5)


class TestSeedAxisChunking:
    """Groups beyond the VMEM-bounded max_seeds must split into balanced
    chunks INSIDE window_scores_multi / counts_from_r_multi — the CGS
    multi path and grouped scanning pass whole (W, K) groups straight to
    the kernels (advisor r4 medium finding: at K=5, W=12, M~8-10 the
    un-chunked stacked transients exceed v5e VMEM)."""

    def test_window_scores_multi_chunks_match(self, monkeypatch):
        from bammmotif2_tpu.ops import escore, pallas_em

        K, W = 2, 8
        v, data, motif = _setup(K, W)
        M = 5
        luts = TestSeedStackedKernel._luts(v, data, M)
        # force chunking at tiny M so the test stays cheap
        monkeypatch.setattr(pallas_em, "max_seeds", lambda *a, **k: 2)
        sc_m, mask_m = pallas_em.window_scores_multi(
            luts, data["cidx"], data["lens"], A=4, K=K, W=W, interpret=True
        )
        assert sc_m.shape[0] == M
        for m in range(M):
            sc_g, _ = escore.window_scores(
                luts[m], data["cidx"], data["lens"], W
            )
            np.testing.assert_allclose(
                np.asarray(sc_m[m]), np.asarray(sc_g), atol=1e-5
            )

    def test_counts_from_r_multi_chunks_match(self, monkeypatch):
        from bammmotif2_tpu.ops import escore, pallas_em

        K, W = 2, 8
        v, data, motif = _setup(K, W)
        cidx, lens = data["cidx"], data["lens"]
        S, N, L = cidx.shape
        n_win = L - W + 1
        R = encode.num_rows(4, K)
        M = 5
        rng = np.random.default_rng(5)
        mask = np.asarray(escore.window_mask(lens, n_win, W))
        r = np.zeros((M, S, N, n_win), np.float32)
        for m in range(M):
            for n in range(N):
                valid = np.nonzero(mask[n])[0]
                if len(valid):
                    r[m, rng.integers(0, S), n, rng.choice(valid)] = 1.0
        r_msnl = jnp.pad(
            jnp.asarray(r), ((0, 0), (0, 0), (0, 0), (0, L - n_win))
        )
        monkeypatch.setattr(pallas_em, "max_seeds", lambda *a, **k: 2)
        C_m = pallas_em.counts_from_r_multi(
            r_msnl, cidx, A=4, K=K, W=W, R=R, interpret=True
        )
        assert C_m.shape == (M, R + 1, W)
        for m in range(M):
            C_ref = escore.mstep_counts(jnp.asarray(r[m]), cidx, R, W)
            np.testing.assert_allclose(
                np.asarray(C_m[m]), np.asarray(C_ref), atol=1e-5
            )
