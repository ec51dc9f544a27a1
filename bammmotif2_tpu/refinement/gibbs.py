"""Collapsed Gibbs sampling refinement with pseudo-count (alpha) learning.

TPU-native equivalent of ``src/refinement/GibbsSampling.{h,cpp}``
(``GibbsSampling::optimize``, ``CollapsedGibbsSampling``, ``updateAlphas``).

Deviation (documented, SURVEY.md 3.4): the reference resamples z_n
sequence-by-sequence with leave-one-out counts (inherently sequential); we
use the batch-synchronous variant — sample ALL z_n from the current model,
then rebuild counts once.  Equivalent in expectation for the N >= 1000
sequence sets this tool targets, and it maps the whole sweep onto one XLA
program.  Bit-compat tests therefore gate on the deterministic EM path.

Per iteration:
  1. z-sampling: z_n ~ Categorical({absent} + all windows), posterior
     proportional to the same ZOOPS weights as the EM E-step.
  2. count rebuild: one-hot scatter of sampled positions (reuses
     ops.escore.mstep_counts with a 0/1 responsibility tensor).
  3. q-sampling: q ~ Beta(#occupied + 1, #absent + 1)  (--noQSampling off).
  4. alpha update: one gradient-ascent step on the collapsed log posterior
     w.r.t. log alpha_k(j).  The marginal likelihood of the counts given
     alpha is Dirichlet-multinomial with prior mean = the lower-order
     conditionals (total concentration per context = alpha, since lower
     orders normalize); jax.grad supplies the digamma gradients the
     reference hand-codes.  Prior: alpha ~ InvGamma(1, scale = default
     alpha_k), a weak prior centered on the paper defaults (the exact
     reference prior could not be verified against the empty mount).
"""

from __future__ import annotations

import dataclasses
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from bammmotif2_tpu.models import motif as motif_mod
from bammmotif2_tpu.models.background import BackgroundModel
from bammmotif2_tpu.models.motif import Motif
from bammmotif2_tpu.ops import encode, escore
from bammmotif2_tpu.refinement.em import prepare_data
from bammmotif2_tpu.utils.config import Params
from bammmotif2_tpu.utils.fasta import SequenceSet


@dataclasses.dataclass
class GibbsResult:
    iterations: int
    ll: float
    q: float
    seconds: float
    ll_history: list
    alphas: np.ndarray


def _log_alpha_posterior(log_alphas, counts, f_bg, default_alphas):
    """Collapsed log posterior of log(alpha) given hard counts.

    counts: tuple of per-order count tensors [A^(k+1), W].
    Returns a scalar; differentiable w.r.t. log_alphas [K+1, W].
    """
    K = len(counts) - 1
    A = f_bg.shape[0]
    total = 0.0
    # lower-order prior means (recomputed from counts with current alphas
    # would be circular; use the fixed-point v estimated from these counts)
    v = motif_mod.update_v(counts, jnp.exp(log_alphas), f_bg)
    for k in range(K + 1):
        alpha = jnp.exp(log_alphas[k])[None, :]  # [1, W]
        nk = counts[k]
        W = nk.shape[1]
        if k == 0:
            lower = jnp.tile(f_bg[:, None], (1, W))
        else:
            lower = v[k - 1][jnp.arange(nk.shape[0]) % (A ** k)]
        am = alpha * lower  # prior pseudo-counts per (y, j)
        # sum over kmers y: log Gamma(n + a v') - log Gamma(a v')
        total = total + jnp.sum(jax.lax.lgamma(nk + am) - jax.lax.lgamma(am))
        # sum over contexts x: log Gamma(alpha) - log Gamma(n_x + alpha)
        ctx = nk.reshape(-1, A, W).sum(axis=1)  # [A^k, W]
        total = total + jnp.sum(
            jax.lax.lgamma(alpha) - jax.lax.lgamma(ctx + jnp.broadcast_to(alpha, ctx.shape))
        )
        # InvGamma(1, scale) prior on alpha, plus log-alpha Jacobian:
        # log p(alpha) = log(scale) - 2 log alpha - scale / alpha ; + log alpha
        scale = default_alphas[k][None, :]
        a = jnp.exp(log_alphas[k])[None, :]
        total = total + jnp.sum(-2.0 * jnp.log(a) - scale / a + jnp.log(a))
    return total


@functools.partial(
    jax.jit,
    static_argnames=("A", "K", "W", "sample_z", "sample_q", "learn_alpha", "path"),
)
def gibbs_step(
    v: tuple,
    q,
    log_alphas,
    key,
    data: dict,
    f_bg,
    default_alphas,
    n_real,
    *,
    A: int,
    K: int,
    W: int,
    sample_z: bool,
    sample_q: bool,
    learn_alpha: bool,
    path: str = "gather",
    alpha_lr: float = 0.05,
):
    """One batch-synchronous CGS sweep. Returns new state + diagnostics."""
    cidx, lens, bg_flat = data["cidx"], data["lens"], data["bg_flat"]
    R = encode.num_rows(A, K)
    s_flat = motif_mod.log_odds_lut(v, bg_flat)
    if path.startswith("pallas"):
        from bammmotif2_tpu.ops import pallas_em

        scores, mask = pallas_em.window_scores(
            s_flat, data["qidx"], lens, data["map5"],
            A=A, K=K, W=W, interpret=path == "pallas_interpret",
        )
    else:
        scores, mask = escore.window_scores(s_flat, cidx, lens, W)
    S, N, n_win = scores.shape

    n_win_per_seq = S * mask.sum(axis=1)
    has_win = n_win_per_seq > 0
    log_prior = jnp.where(
        has_win, jnp.log(q) - jnp.log(jnp.maximum(n_win_per_seq, 1)), escore.NEG_INF
    )
    log_w = scores + log_prior[None, :, None]  # [S, N, n_win]
    flat = jnp.concatenate(
        [jnp.full((N, 1), jnp.log1p(-q)), jnp.moveaxis(log_w, 1, 0).reshape(N, -1)],
        axis=1,
    )  # [N, 1 + S*n_win]

    key, sub = jax.random.split(key)
    if sample_z:
        z = jax.random.categorical(sub, flat, axis=-1)  # [N]
    else:
        z = jnp.argmax(flat, axis=-1)
    occupied = z > 0
    zi = z - 1  # flattened (s, i)
    # one-hot via broadcast compare — arbitrary-index scatter serializes on
    # TPU (~300 ms for 10k updates); the compare is a single vector op
    cols = jnp.arange(S * n_win, dtype=zi.dtype)[None, :]
    r = ((cols == zi[:, None]) & occupied[:, None]).astype(jnp.float32)
    r = jnp.moveaxis(r.reshape(N, S, n_win), 1, 0)  # [S, N, n_win]

    if path.startswith("pallas"):
        from bammmotif2_tpu.ops import pallas_em

        L = cidx.shape[2]
        r_snl = jnp.pad(r, ((0, 0), (0, 0), (0, L - n_win)))
        C = pallas_em.counts_from_r(
            r_snl, data["qidx"], data["map5"],
            A=A, K=K, W=W, R=R, interpret=path == "pallas_interpret",
        )
    else:
        C = escore.mstep_counts(r, cidx, R, W)
    counts = motif_mod.counts_from_combined(C[:R], A, K)

    n_occ = occupied.sum()
    key, sub_q = jax.random.split(key)
    if sample_q:
        # q ~ Beta(#occupied + 1, #real - #occupied + 1); n_real excludes
        # zero-length mask/pad rows (CV fold masking), which can never be
        # occupied and must not bias the Beta posterior
        q_new = jax.random.beta(sub_q, n_occ + 1.0, n_real - n_occ + 1.0)
        q_new = jnp.clip(q_new, 1e-4, 1 - 1e-4)
    else:
        q_new = q

    if learn_alpha:
        grad = jax.grad(_log_alpha_posterior)(log_alphas, counts, f_bg, default_alphas)
        log_alphas = log_alphas + alpha_lr * jnp.clip(grad, -10.0, 10.0)
        log_alphas = jnp.clip(log_alphas, jnp.log(1e-2), jnp.log(1e4))

    v_new = motif_mod.update_v(counts, jnp.exp(log_alphas), f_bg)

    # ZOOPS marginal ll for monitoring (same statistic as EM)
    _, _, ll = escore.zoops_posterior(scores, mask, q)
    return v_new, q_new, log_alphas, key, ll, n_occ


@functools.partial(
    jax.jit,
    static_argnames=(
        "A", "K", "W", "sample_z", "sample_q", "learn_alpha", "path", "n_iters"
    ),
)
def gibbs_optimize(
    v: tuple,
    q,
    log_alphas,
    key,
    data: dict,
    f_bg,
    default_alphas,
    n_real,
    *,
    A: int,
    K: int,
    W: int,
    sample_z: bool,
    sample_q: bool,
    learn_alpha: bool,
    path: str,
    n_iters: int,
):
    """Whole CGS run as one device program (lax.scan over sweeps).

    Returns (v, q, log_alphas, ll_history [n_iters], n_occ_history).
    """

    def body(carry, _):
        v, q, la, key = carry
        v, q, la, key, ll, n_occ = gibbs_step(
            v, q, la, key, data, f_bg, default_alphas, n_real,
            A=A, K=K, W=W, sample_z=sample_z, sample_q=sample_q,
            learn_alpha=learn_alpha, path=path,
        )
        return (v, q, la, key), (ll, n_occ)

    (v, q, log_alphas, key), (lls, n_occs) = jax.lax.scan(
        body, (v, q, log_alphas, key), None, length=n_iters
    )
    return v, q, log_alphas, lls, n_occs


def run_gibbs(
    motif: Motif,
    bg: BackgroundModel,
    sset: SequenceSet,
    params: Params | None = None,
    data=None,
    n_real: int | None = None,
) -> GibbsResult:
    """Refine ``motif`` in place by CGS (``GibbsSampling::optimize``).

    ``n_real``: number of REAL sequences when ``data`` rows are masked out
    with length 0 (CV fold masking, cf. run_em)."""
    params = params or Params(CGS=True)
    A, K, W = motif.A, motif.K, motif.W
    if data is None:
        data = prepare_data(sset, bg, K, params.ss)
    if n_real is None:
        n_real = int(data["lens"].shape[0])

    v = tuple(jnp.asarray(vk, jnp.float32) for vk in motif.v)
    q = jnp.asarray(params.q, jnp.float32)
    log_alphas = jnp.log(jnp.asarray(motif.alphas, jnp.float32))
    default_alphas = jnp.asarray(motif.alphas, jnp.float32)
    f_bg = jnp.asarray(motif.f_bg, jnp.float32)
    key = jax.random.PRNGKey(params.seed)

    from bammmotif2_tpu.refinement.em import choose_path

    t0 = time.perf_counter()
    v, q, log_alphas, lls, _n_occs = gibbs_optimize(
        v, q, log_alphas, key, data, f_bg, default_alphas,
        jnp.asarray(n_real, jnp.float32),
        A=A, K=K, W=W,
        sample_z=not params.noZSampling,
        sample_q=not params.noQSampling,
        learn_alpha=not params.noAlphaOptimization,
        path=choose_path(params, K, A=A),
        n_iters=params.maxCGSIterations,
    )
    ll_hist = [float(x) for x in np.asarray(lls)]
    seconds = time.perf_counter() - t0

    motif.v = [np.asarray(vk, np.float64) for vk in v]
    motif.alphas = np.asarray(jnp.exp(log_alphas), np.float64)
    return GibbsResult(
        iterations=len(ll_hist),
        ll=ll_hist[-1] if ll_hist else float("nan"),
        q=float(q),
        seconds=seconds,
        ll_history=ll_hist,
        alphas=np.asarray(jnp.exp(log_alphas)),
    )
