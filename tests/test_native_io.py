"""Native C++ FASTA codec: byte-identical parity with the Python parser.

The codec (native/fasta_codec.cpp via bammmotif2_tpu/io/native.py) is the
fast data-loader path; utils/fasta.py's pure-numpy parser is the behavioral
reference.  Tests are skipped when no C++ toolchain is available.
"""

import numpy as np
import pytest

from bammmotif2_tpu.io import native
from bammmotif2_tpu.utils.alphabet import Alphabet
from bammmotif2_tpu.utils.fasta import read_fasta

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native codec unavailable (no g++?)"
)

TRICKY = """
>seq one  with spaces\t
ACGTACGT
acgtNNria

; old-style comment
>seq_two
AC
GT
>empty_seq
>seq_three
acgt
"""

HEADERLESS = "ACGTACGT\nACGT\n>named\nTTTT\n"


def _both(tmp_path, text, alphabet=None):
    p = tmp_path / "t.fasta"
    p.write_text(text)
    nat = read_fasta(p, alphabet, use_native=True)
    py = read_fasta(p, alphabet, use_native=False)
    return nat, py


def _assert_same(nat, py):
    assert nat.headers == py.headers
    np.testing.assert_array_equal(nat.lens, py.lens)
    np.testing.assert_array_equal(nat.codes, py.codes)


class TestNativeParity:
    def test_tricky_fasta(self, tmp_path):
        nat, py = _both(tmp_path, TRICKY)
        _assert_same(nat, py)
        assert nat.headers[0] == "seq one  with spaces"
        assert nat.lens.tolist() == [17, 4, 0, 4]

    def test_headerless_leading_data(self, tmp_path):
        nat, py = _both(tmp_path, HEADERLESS)
        _assert_same(nat, py)
        assert nat.headers == ["unnamed", "named"]

    def test_crlf_line_endings(self, tmp_path):
        nat, py = _both(tmp_path, ">a\r\nACGT\r\nAC\r\n>b\r\nGGTT\r\n")
        _assert_same(nat, py)
        assert nat.lens.tolist() == [6, 4]

    def test_lone_cr_line_endings(self, tmp_path):
        # classic-Mac line endings: '\r' alone must break lines like
        # Python's universal-newline text mode does
        p = tmp_path / "mac.fasta"
        p.write_bytes(b">a\rACGT\rAC\r>b\rGGTT\r")
        nat = read_fasta(p, use_native=True)
        py = read_fasta(p, use_native=False)
        _assert_same(nat, py)
        assert nat.lens.tolist() == [6, 4]

    def test_methylc_alphabet(self, tmp_path):
        alpha = Alphabet.from_type("METHYLC")
        nat, py = _both(tmp_path, ">m\nACGTM\nmmACG\n", alpha)
        _assert_same(nat, py)
        assert nat.codes[0, 4] == 4  # M code

    def test_random_large(self, tmp_path):
        rng = np.random.default_rng(0)
        lines = []
        for i in range(500):
            length = int(rng.integers(1, 300))
            s = "".join(rng.choice(list("ACGTNacgtn"), size=length))
            lines.append(f">r{i}")
            for off in range(0, length, 70):
                lines.append(s[off : off + 70])
        nat, py = _both(tmp_path, "\n".join(lines) + "\n")
        _assert_same(nat, py)

    def test_revcomp_batch_matches_numpy(self):
        from bammmotif2_tpu.ops.encode import revcomp_codes

        rng = np.random.default_rng(1)
        alpha = Alphabet.standard()
        N, L = 40, 60
        lens = rng.integers(1, L + 1, N).astype(np.int32)
        codes = np.full((N, L), -2, np.int8)
        for i in range(N):
            codes[i, : lens[i]] = rng.integers(-1, 4, lens[i])
        table = np.array(
            [alpha.letters.index(c) for c in alpha.complements], np.int8
        )
        out = native.revcomp_batch(codes, lens, table)
        ref = revcomp_codes(codes, lens, table)
        np.testing.assert_array_equal(out, ref)
