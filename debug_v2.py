"""Debug V2 kernel parity vs the gather oracle on CPU (interpret mode)."""
import os
import jax
if not os.environ.get("DEBUG_V2_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

import probe_v2
from bammmotif2_tpu.models import seeds as seeds_mod
from bammmotif2_tpu.models.background import BackgroundModel
from bammmotif2_tpu.models.motif import log_odds_lut
from bammmotif2_tpu.ops import encode, escore
from bammmotif2_tpu.ops import pallas_em as cur
from bammmotif2_tpu.refinement.em import prepare_data
from bammmotif2_tpu.utils.alphabet import Alphabet
from bammmotif2_tpu.utils.fasta import SequenceSet


def build(K, N, L, W, seed=0, ragged=False):
    rng = np.random.default_rng(seed)
    alphabet = Alphabet.from_type("STANDARD")
    codes = rng.integers(0, 4, (N, L)).astype(np.int8)
    if ragged:
        lens = rng.integers(max(2, W - 3), L + 1, N).astype(np.int32)
        for i in range(N):
            codes[i, lens[i]:] = -1
    else:
        lens = np.full(N, L, np.int32)
    sset = SequenceSet(codes=codes, lens=lens,
                       headers=[f"s{i}" for i in range(N)], alphabet=alphabet)
    bg = BackgroundModel.from_sequence_set(sset, order=min(2, K + 1),
                                           alpha=10.0, ss=False)
    pwm = rng.dirichlet(np.ones(4), W)
    motif = seeds_mod.motif_from_pwm(pwm, K=K, f_bg=sset.base_frequencies())
    data = prepare_data(sset, bg, K, ss=False)
    v = tuple(jnp.asarray(vk, jnp.float32) for vk in motif.v)
    s_flat = log_odds_lut(v, data["bg_flat"])
    return s_flat, data


def oracle(s_flat, data, q, W, K):
    R = s_flat.shape[0] - 1
    scores, mask = escore.window_scores(s_flat, data["cidx"], data["lens"], W)
    r, r0, ll = escore.zoops_posterior(scores, mask, q)
    C = escore.mstep_counts(r, data["cidx"], R, W)
    return C, ll


def main():
    for name, kw in [
        ("K0 tiny uniform", dict(K=0, N=24, L=40, W=8)),
        ("K0 tiny ragged", dict(K=0, N=24, L=40, W=8, ragged=True)),
        ("K2 uniform", dict(K=2, N=80, L=60, W=12)),
        ("K2 ragged+short", dict(K=2, N=80, L=60, W=12, ragged=True)),
        ("K3 uniform", dict(K=3, N=40, L=50, W=10)),
    ]:
        ragged = kw.pop("ragged", False)
        K, W = kw["K"], kw["W"]
        s_flat, data = build(**kw, ragged=ragged)
        R = s_flat.shape[0] - 1
        q = 0.9
        C0, ll0 = oracle(s_flat, data, q, W, K)
        C1, ll1 = probe_v2.em_counts_v2(
            s_flat, data["qidx"], data["lens"], q, data["map5"],
            A=4, K=K, W=W, R=R, interpret=True)
        C2, ll2 = cur.em_counts(
            s_flat, data["qidx"], data["lens"], q, data["map5"],
            A=4, K=K, W=W, R=R, interpret=True)
        dC1 = float(jnp.max(jnp.abs(C0 - C1)) / (jnp.max(jnp.abs(C0)) + 1e-30))
        dC2 = float(jnp.max(jnp.abs(C0 - C2)) / (jnp.max(jnp.abs(C0)) + 1e-30))
        dll1 = float(jnp.abs(ll0 - ll1))
        dll2 = float(jnp.abs(ll0 - ll2))
        print(f"{name:20s} v2: dC={dC1:.2e} dll={dll1:.3e} | "
              f"cur: dC={dC2:.2e} dll={dll2:.3e}", flush=True)


if __name__ == "__main__":
    main()
