"""Tests for alphabet, FASTA tensorization, and combined k-mer indexing."""

import io

import numpy as np
import pytest

from bammmotif2_tpu.ops import encode
from bammmotif2_tpu.utils.alphabet import AMBIG, Alphabet
from bammmotif2_tpu.utils.fasta import PAD, SequenceSet, read_fasta, write_fasta


class TestAlphabet:
    def test_standard_roundtrip(self):
        a = Alphabet.standard()
        assert a.size == 4
        codes = a.encode("ACGTacgt")
        assert codes.tolist() == [0, 1, 2, 3, 0, 1, 2, 3]
        assert a.decode(codes[:4]) == "ACGT"

    def test_ambiguous(self):
        a = Alphabet.standard()
        assert a.encode("ANT").tolist() == [0, AMBIG, 3]
        assert a.decode(a.encode("ANT")) == "ANT"

    def test_revcomp(self):
        a = Alphabet.standard()
        assert a.decode(a.revcomp(a.encode("AACGT"))) == "ACGTT"
        assert a.decode(a.revcomp(a.encode("ANT"))) == "ANT"

    def test_kmer_index_lexicographic(self):
        a = Alphabet.standard()
        assert a.kmer_to_index("AA") == 0
        assert a.kmer_to_index("AC") == 1
        assert a.kmer_to_index("CA") == 4
        assert a.kmer_to_index("TT") == 15
        assert a.index_to_kmer(11, 2) == "GT"
        for i in range(64):
            assert a.kmer_to_index(a.index_to_kmer(i, 3)) == i

    def test_methylc(self):
        a = Alphabet.from_type("METHYLC")
        assert a.size == 5
        assert a.encode("M").tolist() == [4]


class TestFasta:
    def test_parse_basic(self, tmp_path):
        p = tmp_path / "x.fa"
        p.write_text(">s1 first\nACGT\nACGT\n\n>s2\nttnna\n")
        ss = read_fasta(p)
        assert ss.n == 2
        assert ss.headers == ["s1 first", "s2"]
        assert ss.lens.tolist() == [8, 5]
        assert ss.sequence_str(0) == "ACGTACGT"
        assert ss.sequence_str(1) == "TTNNA"
        assert ss.codes[1, 5] == PAD

    def test_roundtrip(self, tmp_path):
        ss = SequenceSet.from_sequences(["ACGTT", "GG"], ["a", "b"])
        write_fasta(tmp_path / "y.fa", ss)
        ss2 = read_fasta(tmp_path / "y.fa")
        assert ss2.headers == ["a", "b"]
        assert ss2.sequence_str(0) == "ACGTT"
        assert ss2.sequence_str(1) == "GG"

    def test_stringio(self):
        ss = read_fasta(io.StringIO(">a\nACGT\n"))
        assert ss.n == 1

    def test_base_frequencies(self):
        ss = SequenceSet.from_sequences(["AACN", "GT"])
        f = ss.base_frequencies()
        np.testing.assert_allclose(f, [2 / 5, 1 / 5, 1 / 5, 1 / 5])


def naive_cidx(seq_codes, A, K):
    """Reference implementation of the combined index for one sequence."""
    off = encode.order_offsets(A, K)
    R = off[-1]
    out = []
    for t, c in enumerate(seq_codes):
        if c < 0:
            out.append(R)
            continue
        # longest unambiguous context ending at t-1
        m = 0
        while m < K and t - (m + 1) >= 0 and seq_codes[t - (m + 1)] >= 0:
            m += 1
        y = 0
        for d in range(t - m, t + 1):
            y = y * A + int(seq_codes[d])
        out.append(off[m] + y)
    return np.array(out)


class TestCombinedIndex:
    @pytest.mark.parametrize("K", [0, 1, 2, 4])
    def test_matches_naive(self, K):
        rng = np.random.default_rng(0)
        A = 4
        seqs = rng.integers(0, 4, size=(5, 30)).astype(np.int8)
        seqs[0, 3] = AMBIG
        seqs[1, 0] = AMBIG
        seqs[2, 10:] = PAD
        got = np.asarray(encode.combined_kmer_index(seqs, A, K))
        for n in range(5):
            np.testing.assert_array_equal(got[n], naive_cidx(seqs[n], A, K), err_msg=f"n={n}")

    def test_offsets(self):
        np.testing.assert_array_equal(encode.order_offsets(4, 2), [0, 4, 20, 84])
        assert encode.num_rows(4, 2) == 84
        assert encode.num_rows(4, 5) == 4 + 16 + 64 + 256 + 1024 + 4096

    def test_revcomp_codes(self):
        a = Alphabet.standard()
        ss = SequenceSet.from_sequences(["AACGT", "GG"])
        table = np.array([a.letters.index(c) for c in a.complements], dtype=np.int8)
        rc = encode.revcomp_codes(ss.codes, ss.lens, table)
        assert a.decode(rc[0, :5]) == "ACGTT"
        assert a.decode(rc[1, :2]) == "CC"
        assert rc[1, 2] == PAD

    def test_strand_indices_shape(self):
        ss = SequenceSet.from_sequences(["ACGTACGT", "ACGT"])
        cidx, lens = encode.strand_indices(ss, K=2, ss=False)
        assert cidx.shape == (2, 2, 8)
        cidx1, _ = encode.strand_indices(ss, K=2, ss=True)
        assert cidx1.shape == (1, 2, 8)


class TestNumpyCombinedIndex:
    def test_matches_jnp_path(self):
        """combined_kmer_index_np (host counting path) is bit-identical to
        the device encoder, including AMBIG (-1) and PAD (-2) handling."""
        from bammmotif2_tpu.ops import encode
        import jax.numpy as jnp

        rng = np.random.default_rng(11)
        for A, K in ((4, 0), (4, 2), (4, 4), (5, 2)):
            codes = rng.integers(0, A, (7, 33)).astype(np.int8)
            codes[rng.random(codes.shape) < 0.08] = -1   # AMBIG
            for i in range(7):
                codes[i, rng.integers(20, 34):] = -2     # PAD tails
            a = encode.combined_kmer_index_np(codes, A, K)
            b = np.asarray(encode.combined_kmer_index(jnp.asarray(codes), A, K))
            np.testing.assert_array_equal(a, b, err_msg=f"A={A} K={K}")
