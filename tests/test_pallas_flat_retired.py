"""Parity tests for the RETIRED flat-layout kernel (tools/pallas_flat.py).

The flat kernel lost the round-3 device-loop A/B at every order
(docs/PERFORMANCE.md, "Flat-layout kernel A/B") and was retired from the
production dispatch (refinement.em no longer offers a 'flat' path, and
prepare_data no longer builds its qidx/map5 tensors).  It stays in
tools/ as a documented negative result; these tests keep it honest —
its math still matches the gather oracle — without it being production
maintenance surface.
"""

import os
import sys

import numpy as np
import pytest

import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import pallas_flat  # noqa: E402  (tools/pallas_flat.py)

from bammmotif2_tpu.models.motif import log_odds_lut  # noqa: E402
from bammmotif2_tpu.ops import encode, escore  # noqa: E402

from tests.test_pallas_em import _setup  # noqa: E402


def _flat_inputs(sset_data_motif, K):
    """qidx/map5 for the flat kernel (no longer part of prepare_data)."""
    v, data, motif = sset_data_motif
    # rebuild the base-5 codes from the same sequences via the encode ops
    # (prepare_data dropped them when the kernel retired)
    return v, data, motif


class TestFlatKernelRetired:
    @pytest.mark.parametrize("K,W", [(0, 8), (2, 8), (5, 6)])
    def test_em_counts_matches_gather_oracle(self, K, W):
        v, data, motif = _setup(K, W)
        R = encode.num_rows(4, K)
        # the flat kernel's inputs, built on demand
        from bammmotif2_tpu.utils.fasta import SequenceSet  # noqa: F401

        s_flat = log_odds_lut(v, data["bg_flat"])
        q = jnp.float32(0.7)
        scores, mask = escore.window_scores(
            s_flat, data["cidx"], data["lens"], W
        )
        r, _r0, ll = escore.zoops_posterior(scores, mask, q)
        C_ref = escore.mstep_counts(r, data["cidx"], R, W)

        map5 = jnp.asarray(encode.map_base5_to_combined(4, K))
        qidx = _qidx_from_cidx_setup(K, W)
        C, ll_f = pallas_flat.em_counts(
            s_flat, qidx, data["lens"], q, map5,
            A=4, K=K, W=W, R=R, interpret=True,
        )
        np.testing.assert_allclose(np.asarray(C), np.asarray(C_ref), atol=5e-5)
        np.testing.assert_allclose(float(ll_f), float(ll), rtol=1e-5)


def _qidx_from_cidx_setup(K, W):
    """Recreate the same sequences _setup builds and base-5 encode them."""
    from tests.test_pallas_em import _setup as setup2

    # _setup is deterministic (seeded rng), so rebuilding the SequenceSet
    # yields identical codes; strand_base5_indices gives the flat codes
    import numpy as _np

    rng = _np.random.default_rng(0)
    from bammmotif2_tpu.utils.fasta import SequenceSet

    seqs = []
    n, l = 60, 50
    for i in range(n):
        length = int(rng.integers(W + 2, l + 1))
        s = rng.choice(list("ACGT"), size=length)
        if i % 3 == 0 and length > 10:
            s[5] = "N"
        seqs.append("".join(s))
    sset = SequenceSet.from_sequences(seqs)
    return encode.strand_base5_indices(sset, K, ss=False)
