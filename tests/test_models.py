"""Tests for background model, motif model, seeds, and file formats."""

import numpy as np
import pytest

from bammmotif2_tpu.models import seeds as seeds_mod
from bammmotif2_tpu.models.background import BackgroundModel
from bammmotif2_tpu.models.motif import Motif, counts_from_combined, update_v
from bammmotif2_tpu.models.motifset import extend_motif
from bammmotif2_tpu.utils.alphabet import Alphabet
from bammmotif2_tpu.utils.fasta import SequenceSet

import jax.numpy as jnp


def rand_set(n=50, l=100, seed=0):
    rng = np.random.default_rng(seed)
    return SequenceSet.from_sequences(
        ["".join(rng.choice(list("ACGT"), size=l)) for _ in range(n)]
    )


class TestBackgroundModel:
    def test_rows_normalize(self):
        bg = BackgroundModel.from_sequence_set(rand_set(), order=2)
        for k, vk in enumerate(bg.v):
            sums = vk.reshape(-1, 4).sum(axis=1)
            np.testing.assert_allclose(sums, 1.0, atol=1e-12, err_msg=f"order {k}")

    def test_order0_close_to_freqs(self):
        ss = rand_set(n=200, l=200)
        bg = BackgroundModel.from_sequence_set(ss, order=1, ss=True)
        np.testing.assert_allclose(bg.v[0], ss.base_frequencies(), atol=2e-3)

    def test_double_strand_symmetry(self):
        # counting both strands makes mono frequencies complement-symmetric
        bg = BackgroundModel.from_sequence_set(rand_set(seed=3), order=0, ss=False)
        np.testing.assert_allclose(bg.v[0][0], bg.v[0][3], atol=1e-12)  # A vs T
        np.testing.assert_allclose(bg.v[0][1], bg.v[0][2], atol=1e-12)  # C vs G

    def test_roundtrip_hbcp(self, tmp_path):
        bg = BackgroundModel.from_sequence_set(rand_set(), order=2, alpha=10.0)
        p_cond, p_full = bg.write(str(tmp_path), "t")
        bg2 = BackgroundModel.read(p_cond)
        assert bg2.order == 2
        assert bg2.alpha == pytest.approx(10.0)
        for a, b in zip(bg.v, bg2.v):
            np.testing.assert_allclose(a, b, rtol=2e-6)
        # .hbp: full probs of each order sum to 1
        for k, pk in enumerate(bg.full_probs()):
            np.testing.assert_allclose(pk.sum(), 1.0, atol=1e-9)

    def test_conditional_flat_shape(self):
        bg = BackgroundModel.from_sequence_set(rand_set(), order=2)
        flat = bg.conditional_flat(K_model=3)
        assert flat.shape == (4 + 16 + 64 + 256,)
        # rows of the order-3 block must reuse the order-2 bg conditionals
        y = 123  # arbitrary 4-mer
        np.testing.assert_allclose(flat[4 + 16 + 64 + y], bg.v[2][y % 64])


class TestMotifMath:
    def test_update_v_normalized(self):
        rng = np.random.default_rng(0)
        K, W, A = 2, 6, 4
        counts = tuple(
            jnp.asarray(rng.random((A ** (k + 1), W)) * 50) for k in range(K + 1)
        )
        alphas = jnp.asarray(Motif.default_alphas(K, W))
        f_bg = jnp.asarray([0.3, 0.2, 0.2, 0.3])
        v = update_v(counts, alphas, f_bg)
        for k, vk in enumerate(v):
            sums = np.asarray(vk).reshape(-1, A, W).sum(axis=1)
            np.testing.assert_allclose(sums, 1.0, atol=1e-5, err_msg=f"order {k}")

    def test_zero_counts_collapse_to_lower_order(self):
        # with zero higher-order counts, v^(k)(y) == v^(k-1)(y')
        K, W = 2, 4
        rng = np.random.default_rng(1)
        c0 = rng.random((4, W)) * 100
        counts = (jnp.asarray(c0), jnp.zeros((16, W)), jnp.zeros((64, W)))
        v = update_v(counts, jnp.asarray(Motif.default_alphas(K, W)), jnp.full(4, 0.25))
        v0, v1, v2 = (np.asarray(x) for x in v)
        np.testing.assert_allclose(v1, v0[np.arange(16) % 4], atol=1e-6)
        np.testing.assert_allclose(v2, v1[np.arange(64) % 16], atol=1e-6)

    def test_counts_from_combined_marginalization(self):
        A, K, W = 4, 2, 3
        R = 4 + 16 + 64
        rng = np.random.default_rng(2)
        C = jnp.asarray(rng.random((R, W)))
        counts = counts_from_combined(C, A, K)
        # total order-0 mass = all combined mass
        np.testing.assert_allclose(
            np.asarray(counts[0]).sum(), np.asarray(C).sum(), rtol=1e-6
        )
        # order-1 = direct order-1 + sum over oldest base of order-2
        expect = np.asarray(C)[4:20] + np.asarray(C)[20:].reshape(4, 16, W).sum(0)
        np.testing.assert_allclose(np.asarray(counts[1]), expect, rtol=1e-6)


class TestMotifIO:
    def make_motif(self, K=2, W=5):
        rng = np.random.default_rng(0)
        counts = [rng.random((4 ** (k + 1), W)) * 30 for k in range(K + 1)]
        m = Motif(
            W, K, [np.zeros_like(c) for c in counts],
            Motif.default_alphas(K, W), np.full(4, 0.25),
        )
        m.set_v_from_counts(counts)
        return m

    def test_roundtrip_ihbcp(self, tmp_path):
        m = self.make_motif()
        p_cond, p_full = m.write(str(tmp_path), "m1")
        m2 = Motif.read(p_cond, f_bg=m.f_bg)
        assert (m2.W, m2.K) == (m.W, m.K)
        for a, b in zip(m.v, m2.v):
            np.testing.assert_allclose(a, b, rtol=2e-4)

    def test_pwm_view(self):
        m = self.make_motif()
        assert m.pwm().shape == (5, 4)
        np.testing.assert_allclose(m.pwm().sum(axis=1), 1.0, atol=1e-6)


class TestSeeds:
    def test_read_meme(self, tmp_path):
        p = tmp_path / "s.meme"
        p.write_text(
            "MEME version 4\n\nALPHABET= ACGT\n\n"
            "Background letter frequencies\nA 0.25 C 0.25 G 0.25 T 0.25\n\n"
            "MOTIF seed1\n"
            "letter-probability matrix: alength= 4 w= 3 nsites= 20 E= 1e-5\n"
            "0.9 0.05 0.03 0.02\n0.1 0.1 0.7 0.1\n0.25 0.25 0.25 0.25\n\n"
            "MOTIF seed2\n"
            "letter-probability matrix: alength= 4 w= 2\n"
            "1.0 0.0 0.0 0.0\n0.0 0.0 0.0 1.0\n"
        )
        seeds = seeds_mod.read_meme(str(p))
        assert [s.name for s in seeds] == ["seed1", "seed2"]
        assert seeds[0].pwm.shape == (3, 4)
        assert seeds[0].nsites == 20
        assert seeds[0].evalue == pytest.approx(1e-5)
        assert seeds[1].pwm.shape == (2, 4)

    def test_motif_from_pwm_orders_collapse(self):
        pwm = np.array([[0.7, 0.1, 0.1, 0.1], [0.1, 0.1, 0.1, 0.7]])
        m = seeds_mod.motif_from_pwm(pwm, K=2, f_bg=np.full(4, 0.25))
        # higher-order conditionals equal order-0 of the newest base
        np.testing.assert_allclose(m.v[2], m.v[0][np.arange(64) % 4], atol=1e-9)
        # order-0 close to the PWM (pseudo-count shrinkage toward f_bg)
        assert abs(m.v[0][0, 0] - 0.7) < 0.01

    def test_iupac(self):
        # mixture convention: p = soft*uniform(members) + (1-soft)/4
        pwm = seeds_mod.iupac_to_pwm("ARN")
        np.testing.assert_allclose(pwm.sum(axis=1), 1.0)
        np.testing.assert_allclose(pwm[0], [0.775, 0.075, 0.075, 0.075])
        np.testing.assert_allclose(pwm[1], [0.425, 0.075, 0.425, 0.075])
        np.testing.assert_allclose(pwm[2], [0.25] * 4)

    def test_iupac_members_always_outweigh_nonmembers(self):
        """Every IUPAC code, every softness: member bases must beat
        non-members (the previous share-soft-among-members form INVERTED
        3-member codes — B/D/H/V gave the explicitly excluded base the
        highest probability whenever soft < 3/4)."""
        letters = "ACGT"
        for soft in (0.5, 0.6, 0.7, 0.9):
            for code, members in seeds_mod.IUPAC.items():
                if len(members) == 4:
                    continue
                row = seeds_mod.iupac_to_pwm(code, soft=soft)[0]
                member_min = min(row[letters.index(b)] for b in members)
                nonmember_max = max(
                    row[i] for i, b in enumerate(letters) if b not in members
                )
                assert member_min > nonmember_max, (code, soft, row)

    def test_binding_sites(self, tmp_path):
        p = tmp_path / "sites.txt"
        p.write_text("ACGT\nACGT\nACGA\nTCGT\n")
        m = seeds_mod.motif_from_binding_sites(str(p), K=1, f_bg=np.full(4, 0.25))
        assert (m.W, m.K) == (4, 1)
        # position 1 is always C
        assert m.v[0][1, 1] > 0.8
        np.testing.assert_allclose(m.v[0].sum(axis=0), 1.0, atol=1e-6)

    def test_extend(self):
        pwm = np.array([[0.7, 0.1, 0.1, 0.1]])
        m = seeds_mod.motif_from_pwm(pwm, K=1, f_bg=np.full(4, 0.25))
        m2 = extend_motif(m, 1, 2)
        assert m2.W == 4
        np.testing.assert_allclose(m2.v[0][:, 0], 0.25)
        np.testing.assert_allclose(m2.v[0][:, 1], m.v[0][:, 0])


class TestGoldenHarnessHelpers:
    """The comparison machinery of tools/golden_harness.py is exercised in
    CI even while no reference binary exists (mount empty; SURVEY.md
    provenance caveat): parse/compare must round-trip our own writers."""

    def test_model_file_comparison_roundtrip(self, tmp_path):
        import sys

        sys.path.insert(0, "tools")
        import golden_harness as gh

        from bammmotif2_tpu.models.background import BackgroundModel
        from bammmotif2_tpu.utils.fasta import SequenceSet

        sset = SequenceSet.from_sequences(
            ["ACGTACGTACGTACGT", "TTGACCGTAAACGTAC"] * 4
        )
        bg = BackgroundModel.from_sequence_set(sset, order=2)
        p1, _ = bg.write(str(tmp_path), "a")
        p2, _ = bg.write(str(tmp_path), "b")
        assert gh.compare_model_files(p1, p2, atol=1e-9) == []
        # a perturbed copy must be flagged
        txt = open(p1).read().splitlines()
        for i, line in enumerate(txt):
            s = line.strip()
            if s and not s.startswith("#"):
                vals = s.split()
                vals[0] = str(float(vals[0]) + 0.01)
                txt[i] = " ".join(vals)
                break
        p3 = tmp_path / "c.hbcp"
        p3.write_text("\n".join(txt) + "\n")
        assert gh.compare_model_files(p1, str(p3), atol=1e-4) != []

    def test_occurrence_comparison(self, tmp_path):
        import sys

        sys.path.insert(0, "tools")
        import golden_harness as gh

        hdr = "header\tlength\tstrand\tstart..end\tsite\tscore\tp-value\te-value\n"
        a = tmp_path / "a.occurrence"
        b = tmp_path / "b.occurrence"
        a.write_text(hdr + "s1\t80\t+\t5..12\tTGACTCAG\t12.5\t1e-5\t1e-2\n")
        b.write_text(hdr + "s1\t80\t+\t5..12\tTGACTCAG\t12.5004\t2e-5\t2e-2\n")
        assert gh.compare_occurrences(str(a), str(b)) == []  # score atol 1e-3
        c = tmp_path / "c.occurrence"
        c.write_text(hdr + "s1\t80\t-\t5..12\tTGACTCAG\t12.5\t1e-5\t1e-2\n")
        assert gh.compare_occurrences(str(a), str(c)) != []


class TestSeedParsingRobustness:
    def test_meme_blank_line_after_header(self, tmp_path):
        """A blank line between 'letter-probability matrix:' and the rows
        must not silently drop the motif (review regression)."""
        p = tmp_path / "m.meme"
        p.write_text(
            "MEME version 4\n\nMOTIF m1\n"
            "letter-probability matrix: alength= 4 w= 2 nsites= 10\n"
            "\n"
            "0.7 0.1 0.1 0.1\n0.1 0.7 0.1 0.1\n\n"
            "MOTIF m2\n"
            "letter-probability matrix: alength= 4 w= 1 nsites= 5\n"
            "0.25 0.25 0.25 0.25\n"
        )
        seeds = seeds_mod.read_meme(str(p))
        assert [s.name for s in seeds] == ["m1", "m2"]
        assert seeds[0].pwm.shape == (2, 4)

    def test_methylc_roundtrip_reads_alphabet_header(self, tmp_path):
        """Motif.read honors the '# alphabet =' header Motif.write emits
        (extended-alphabet checkpoints round-trip without an explicit
        alphabet argument)."""
        from bammmotif2_tpu.models.motif import Motif
        from bammmotif2_tpu.utils.alphabet import Alphabet

        alphabet = Alphabet.from_type("METHYLC")
        pwm = np.full((4, 5), 0.1)
        pwm[:, 0] = 0.6
        m = seeds_mod.motif_from_pwm(
            pwm / pwm.sum(1, keepdims=True), K=1,
            f_bg=np.full(5, 0.2), alphabet=alphabet, name="mm",
        )
        paths = m.write(str(tmp_path), "mm")
        m2 = Motif.read(paths[0])
        assert m2.A == 5 and m2.W == 4 and m2.K == 1
        for a, b in zip(m.v, m2.v):
            np.testing.assert_allclose(a, b, atol=1e-5)

    def test_empty_pattern_raises(self):
        from bammmotif2_tpu.models.motifset import load_motifs
        from bammmotif2_tpu.utils.config import Params

        with pytest.raises(ValueError, match="no patterns"):
            load_motifs(
                Params(pattern=";"), np.full(4, 0.25), None
            )
