"""k-mer index tensors: the device-side sequence representation.

Core idea (TPU-first; no analogue in the reference, which recomputes k-mer
indices per position in C++ loops — ``Sequence::extractKmer`` inside
``EM::EStep`` / ``ScoreSeqSet::score``):

Every conditional-probability table of every order k <= K is stored in ONE
combined LUT with rows grouped by order; order k's block starts at

    off[k] = sum_{m<k} A^(m+1)

and within a block a (k+1)-mer ending at position t is its lexicographic
code (oldest base most significant).  A single precomputed index tensor

    cidx[n, t] = off[m(t)] + kmer_code_{m(t)}(n, t)     (int32)

where m(t) = min(t, K, #consecutive unambiguous bases ending just before t)
turns window scoring into a pure gather (or one-hot matmul) against the
combined LUT, and the EM M-step into the transposed scatter on the same
index.  Sequence-start and ambiguous-base context truncation fall out
naturally: truncated positions simply index a lower-order block.  Invalid
positions (ambiguous current base, padding) index the trailing sentinel row
``R`` whose LUT value is 0 and whose counts are discarded.

cidx depends only on the sequences, never on the model, so it is computed
once per run and reused by every EM iteration / scan.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from bammmotif2_tpu.utils.fasta import SequenceSet


def order_offsets(A: int, K: int) -> np.ndarray:
    """off[k] for k = 0..K+1; off[K+1] == R == total #rows excl. sentinel."""
    sizes = [A ** (k + 1) for k in range(K + 1)]
    return np.concatenate([[0], np.cumsum(sizes)]).astype(np.int32)


def num_rows(A: int, K: int) -> int:
    """R: number of combined-LUT rows excluding the sentinel row."""
    return int(order_offsets(A, K)[-1])


@functools.partial(jax.jit, static_argnames=("A", "K"))
def combined_kmer_index(codes: jnp.ndarray, A: int, K: int) -> jnp.ndarray:
    """Compute cidx[n, t] for an int8 code array [N, L].

    codes: int8 [N, L]; >=0 concrete letter, -1 ambiguous, -2 pad.
    Returns int32 [N, L]; invalid positions = R (the sentinel row).
    """
    codes = codes.astype(jnp.int32)
    valid = codes >= 0
    base = jnp.where(valid, codes, 0)
    N, L = codes.shape
    off = order_offsets(A, K)  # static numpy offsets
    R = int(off[-1])

    # shifted[d][:, t] = base[:, t-d]  (zero-filled before sequence start)
    def shift(x, d, fill):
        if d == 0:
            return x
        return jnp.concatenate([jnp.full((N, d), fill, x.dtype), x[:, : L - d]], axis=1)

    shifted = [shift(base, d, 0) for d in range(K + 1)]
    valid_sh = [shift(valid, d, False) for d in range(K + 1)]

    # m(t): longest context of unambiguous bases ending at t-1, capped at K
    # and at t (no context before the sequence start).
    m = jnp.zeros((N, L), jnp.int32)
    ctx_ok = jnp.ones((N, L), bool)
    for d in range(1, K + 1):
        ctx_ok = ctx_ok & valid_sh[d]
        in_range = jnp.arange(L)[None, :] >= d
        m = jnp.where(ctx_ok & in_range, d, m)

    # y_k(t): lexicographic (k+1)-mer code for each candidate order
    y = jnp.zeros((N, L), jnp.int32)  # y_0 built incrementally: y_k = y_{k-1} + base[t-k]*A^k
    cidx = off[0] + base  # order-0 index
    acc = base
    for k in range(1, K + 1):
        acc = acc + shifted[k] * (A ** k)
        cidx = jnp.where(m >= k, off[k] + acc, cidx)
    del y
    return jnp.where(valid, cidx, R).astype(jnp.int32)


def revcomp_codes(codes: np.ndarray, lens: np.ndarray, comp_table: np.ndarray) -> np.ndarray:
    """Host-side reverse complement of a padded code batch.

    rc[n, t] = complement(codes[n, lens[n]-1-t]) for t < lens[n], PAD after.
    Parity: ``Sequence::appendRevComp`` (we keep it as a separate array).
    """
    codes = np.asarray(codes)
    lens = np.asarray(lens)
    N, L = codes.shape
    t = np.arange(L)[None, :]
    src = lens[:, None] - 1 - t
    in_range = src >= 0
    gathered = np.take_along_axis(codes, np.clip(src, 0, L - 1), axis=1)
    comp = np.where(
        gathered >= 0,
        comp_table[np.clip(gathered, 0, len(comp_table) - 1)],
        gathered,  # AMBIG (-1) complements to AMBIG; PAD shouldn't occur in-range
    )
    return np.where(in_range, comp, -2).astype(np.int8)


def strand_indices(sset: SequenceSet, K: int, ss: bool):
    """Build the per-strand combined k-mer index tensors for a SequenceSet.

    Returns (cidx [S, N, L] int32 jnp, lens [N] int32 jnp) with S = 1 for
    single-strand (--ss) or 2 (forward, reverse-complement) otherwise.
    """
    A = sset.alphabet.size
    fwd = combined_kmer_index(jnp.asarray(sset.codes), A, K)
    if ss:
        cidx = fwd[None]
    else:
        table = np.array(
            [sset.alphabet.letters.index(c) for c in sset.alphabet.complements],
            dtype=np.int8,
        )
        rc = revcomp_codes(sset.codes, sset.lens, table)
        cidx = jnp.stack([fwd, combined_kmer_index(jnp.asarray(rc), A, K)])
    return cidx, jnp.asarray(sset.lens)
