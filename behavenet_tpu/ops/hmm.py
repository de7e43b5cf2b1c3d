"""HMM message passing: log-space forward-backward, Viterbi, sampling (JAX).

This is the TPU-native replacement for the external ``ssm`` package's E-step
(reference delegates the whole ARHMM to ssm.HMM — behavenet/fitting/
arhmm_grid_search.py:132-137; docs/installation.rst:59-69 installs the
no-cython branch). All recursions are ``lax.scan`` over time with the state
dimension K vectorized; trials are padded to a common length and masked, and
the EM driver vmaps these kernels over the trial axis so the whole E-step is
one fused XLA program.

Conventions
-----------
- ``log_pi0``: (K,) initial state log-probs
- ``log_P``: (K, K) transition log-probs, rows = from-state (stationary), or
  (T-1, K, K) for time/input-dependent transitions
- ``log_lik``: (T, K) per-frame observation log-likelihoods
- ``mask``: (T,) float/bool; padded frames contribute nothing
"""

import jax
import jax.numpy as jnp
from jax import lax

from behavenet_tpu.ops.scans import chunked_prefix_scan
from jax.scipy.special import logsumexp

__all__ = ['forward', 'forward_parallel', 'backward', 'backward_parallel',
           'forward_backward', 'viterbi', 'viterbi_parallel',
           'sample_states', 'sample_posterior', 'expected_transitions']


def _get_log_P(log_P, t):
    """Support stationary (K,K) and time-varying (T-1,K,K) transitions."""
    if log_P.ndim == 2:
        return log_P
    return log_P[t]


def forward(log_pi0, log_P, log_lik, mask=None):
    """Forward (alpha) recursion in log space.

    Returns (log_alpha (T,K), log_normalizer scalar).
    """
    T, K = log_lik.shape
    if mask is None:
        mask = jnp.ones(T)
    mask = mask.astype(log_lik.dtype)

    alpha0 = log_pi0 + log_lik[0] * mask[0]

    def step(carry, t):
        alpha_prev = carry
        lp = _get_log_P(log_P, t - 1)
        a = logsumexp(alpha_prev[:, None] + lp, axis=0) + log_lik[t] * mask[t]
        # padded frame: carry forward unchanged (no observation, no transition)
        a = jnp.where(mask[t] > 0, a, alpha_prev)
        return a, a

    _, alphas = lax.scan(step, alpha0, jnp.arange(1, T))
    log_alpha = jnp.concatenate([alpha0[None], alphas], axis=0)
    log_Z = logsumexp(log_alpha[-1])
    return log_alpha, log_Z


def backward_parallel(log_P, log_lik, mask=None):
    """Backward pass via ``lax.associative_scan`` (parallel prefix).

    Mirrors :func:`backward` exactly (up to f32 roundoff): the suffix
    log-matmul products of the same chain matrices used by
    :func:`forward_parallel` give beta_t as a row logsumexp.
    """
    T, K = log_lik.shape
    if mask is None:
        mask = jnp.ones(T)
    mask = mask.astype(log_lik.dtype)

    if log_P.ndim == 2:
        lp = jnp.broadcast_to(log_P[None], (T - 1, K, K))
    else:
        lp = log_P
    Ms = lp + (log_lik[1:] * mask[1:, None])[:, None, :]
    identity = jnp.where(jnp.eye(K) > 0, 0.0, -jnp.inf)
    Ms = jnp.where(mask[1:, None, None] > 0, Ms, identity[None])

    # want suffix[t] = M_t (x) ... (x) M_{T-2}; a reverse scan composes in the
    # opposite order, so scan the transposes: (A (x) B)^T = B^T (x) A^T
    suffix_T = _prefix(
        _log_matmul, jnp.swapaxes(Ms, 1, 2), identity, reverse=True)  # (T-1, K, K)
    betas = logsumexp(jnp.swapaxes(suffix_T, 1, 2), axis=2)  # beta_t, t=0..T-2
    log_beta = jnp.concatenate([betas, jnp.zeros((1, K), dtype=log_lik.dtype)], axis=0)
    return log_beta


def backward(log_P, log_lik, mask=None):
    """Backward (beta) recursion in log space. Returns log_beta (T,K)."""
    T, K = log_lik.shape
    if mask is None:
        mask = jnp.ones(T)
    mask = mask.astype(log_lik.dtype)

    beta_T = jnp.zeros(K, dtype=log_lik.dtype)

    def step(carry, t):
        beta_next = carry
        lp = _get_log_P(log_P, t)
        b = logsumexp(lp + (log_lik[t + 1] * mask[t + 1] + beta_next)[None, :], axis=1)
        b = jnp.where(mask[t + 1] > 0, b, beta_next)
        return b, b

    _, betas = lax.scan(step, beta_T, jnp.arange(T - 2, -1, -1))
    log_beta = jnp.concatenate([betas[::-1], beta_T[None]], axis=0)
    return log_beta


def forward_backward(log_pi0, log_P, log_lik, mask=None, parallel=False):
    """Posterior state marginals and expected transitions.

    ``parallel=True`` runs both message passes as ``associative_scan``
    parallel prefixes (log-matmul chains on the MXU) — same results up to
    f32 roundoff, ~an order of magnitude faster on TPU for very long
    trials (measured 7x at T=100k, K=16).

    Returns
    -------
    (gamma (T,K), log_Z, xi_sum (K,K)): ``gamma`` are posterior marginals
    p(z_t | x); ``xi_sum`` is the sum over t of pairwise posteriors
    p(z_t, z_{t+1} | x) (masked), which is the sufficient statistic for the
    transition M-step.
    """
    T, K = log_lik.shape
    if mask is None:
        mask = jnp.ones(T)
    mask = mask.astype(log_lik.dtype)

    if parallel:
        log_alpha, log_Z = forward_parallel(log_pi0, log_P, log_lik, mask)
        log_beta = backward_parallel(log_P, log_lik, mask)
    else:
        log_alpha, log_Z = forward(log_pi0, log_P, log_lik, mask)
        log_beta = backward(log_P, log_lik, mask)

    # posteriors are probabilities: normalize per step instead of relying on
    # alpha_t + beta_t - log_Z == log p exactly. Over very long sequences the
    # sequential f32 recursions accumulate random-walk roundoff (~sqrt(T)
    # ULPs at |alpha| ~ 1e6), enough to push exp() past overflow. The row max
    # is subtracted FIRST (exact: the differences are small), because at huge
    # magnitudes logsumexp's log-correction itself rounds away against the ULP.
    log_gamma = log_alpha + log_beta
    log_gamma = log_gamma - jnp.max(log_gamma, axis=1, keepdims=True)
    log_gamma = log_gamma - logsumexp(log_gamma, axis=1, keepdims=True)
    gamma = jnp.exp(log_gamma) * mask[:, None]

    # pairwise marginals: xi_t(i,j) ∝ alpha_t(i) + logP(i,j) + loglik_{t+1}(j) + beta_{t+1}(j)
    if log_P.ndim == 2:
        lp = log_P[None, :, :]
    else:
        lp = log_P
    log_xi = (log_alpha[:-1, :, None] + lp
              + (log_lik[1:] * mask[1:, None] + log_beta[1:])[:, None, :])
    log_xi = log_xi - jnp.max(log_xi, axis=(1, 2), keepdims=True)
    log_xi = log_xi - logsumexp(log_xi, axis=(1, 2), keepdims=True)
    pair_mask = (mask[:-1] * mask[1:])[:, None, None]
    xi_sum = jnp.sum(jnp.exp(log_xi) * pair_mask, axis=0)
    return gamma, log_Z, xi_sum


def expected_transitions(log_pi0, log_P, log_lik, mask=None):
    """Per-timestep pairwise posteriors (T-1, K, K) — for recurrent M-steps."""
    T, K = log_lik.shape
    if mask is None:
        mask = jnp.ones(T)
    mask = mask.astype(log_lik.dtype)
    log_alpha, log_Z = forward(log_pi0, log_P, log_lik, mask)
    log_beta = backward(log_P, log_lik, mask)
    lp = log_P[None, :, :] if log_P.ndim == 2 else log_P
    log_xi = (log_alpha[:-1, :, None] + lp
              + (log_lik[1:] * mask[1:, None] + log_beta[1:])[:, None, :])
    # per-step normalization (see forward_backward): robust to f32
    # random-walk roundoff on very long sequences
    log_xi = log_xi - jnp.max(log_xi, axis=(1, 2), keepdims=True)
    log_xi = log_xi - logsumexp(log_xi, axis=(1, 2), keepdims=True)
    pair_mask = (mask[:-1] * mask[1:])[:, None, None]
    return jnp.exp(log_xi) * pair_mask


def viterbi(log_pi0, log_P, log_lik, mask=None):
    """Most likely state sequence (T,) int32 via max-product + backtrace."""
    T, K = log_lik.shape
    if mask is None:
        mask = jnp.ones(T)
    mask = mask.astype(log_lik.dtype)

    delta0 = log_pi0 + log_lik[0] * mask[0]

    def fwd(carry, t):
        delta_prev = carry
        lp = _get_log_P(log_P, t - 1)
        scores = delta_prev[:, None] + lp  # (from, to)
        best_prev = jnp.argmax(scores, axis=0)
        d = jnp.max(scores, axis=0) + log_lik[t] * mask[t]
        d = jnp.where(mask[t] > 0, d, delta_prev)
        best_prev = jnp.where(
            mask[t] > 0, best_prev,
            jax.lax.broadcasted_iota(jnp.int32, (K,), 0))  # identity backpointer when padded
        return d, best_prev

    delta_T, backptrs = lax.scan(fwd, delta0, jnp.arange(1, T))

    z_T = jnp.argmax(delta_T).astype(jnp.int32)

    def back(carry, ptrs_t):
        z_next = carry
        z = ptrs_t[z_next]
        return z, z

    _, zs = lax.scan(back, z_T, backptrs, reverse=True)
    return jnp.concatenate([zs, z_T[None]], axis=0).astype(jnp.int32)


def _maxplus_matmul(A, B):
    """(..., K, K) (max, +) matrix product: max_k A[.., i, k] + B[.., k, j]."""
    return jnp.max(A[..., :, :, None] + B[..., None, :, :], axis=-2)


def viterbi_parallel(log_pi0, log_P, log_lik, mask=None):
    """Viterbi via ``associative_scan`` over the (max, +) monoid.

    ``delta_t`` comes from parallel-prefix (max, +) products of the same
    chain matrices as :func:`forward_parallel`; backpointers are then a
    single vectorized argmax over the known deltas, leaving only the
    trivial O(T) integer backtrace sequential. Identical paths to
    :func:`viterbi` up to argmax tie-breaking.
    """
    T, K = log_lik.shape
    if mask is None:
        mask = jnp.ones(T)
    mask = mask.astype(log_lik.dtype)

    if log_P.ndim == 2:
        lp = jnp.broadcast_to(log_P[None], (T - 1, K, K))
    else:
        lp = log_P
    Ms = lp + (log_lik[1:] * mask[1:, None])[:, None, :]
    identity = jnp.where(jnp.eye(K) > 0, 0.0, -jnp.inf)
    Ms = jnp.where(mask[1:, None, None] > 0, Ms, identity[None])

    prefix = _prefix(_maxplus_matmul, Ms, identity)  # (T-1, K, K)
    delta0 = log_pi0 + log_lik[0] * mask[0]
    deltas = jnp.max(delta0[None, :, None] + prefix, axis=1)  # (T-1, K)
    delta = jnp.concatenate([delta0[None], deltas], axis=0)   # (T, K)

    # backpointers from the completed deltas, all timesteps at once
    scores = delta[:-1, :, None] + lp                         # (T-1, K, K)
    psi = jnp.argmax(scores, axis=1).astype(jnp.int32)        # (T-1, K)
    idx = jax.lax.broadcasted_iota(jnp.int32, (T - 1, K), 1)
    psi = jnp.where(mask[1:, None] > 0, psi, idx)             # carry when padded

    z_T = jnp.argmax(delta[-1]).astype(jnp.int32)

    # backtrace by pointer doubling: z_t = psi_t[z_{t+1}] composes the
    # backpointer maps, so the suffix compositions C_t = psi_t o C_{t+1}
    # (an associative suffix scan over K-vectors of indices) give every
    # z_t = C_t[z_T] at O(log T) depth instead of a T-step scan — the
    # sequential backtrace dominated Viterbi wall time at T~100k
    comp = _prefix(_compose_maps, psi, jnp.arange(K, dtype=jnp.int32),
                   reverse=True)                              # (T-1, K)
    zs = comp[:, z_T]
    return jnp.concatenate([zs, z_T[None]], axis=0).astype(jnp.int32)


def _compose_maps(later, earlier):
    """Index-map composition monoid for backtrace/backward-sample scans.

    Suffix-scan convention: first arg is the accumulated later suffix S,
    second the earlier element e; (e o S)[k] = e[S[k]]. Identity is iota.
    """
    return jnp.take_along_axis(earlier, later, axis=-1)


def _presample_path_draws(key, log_alpha, lp, mask):
    """Final-state draw + presampled predecessor maps from filtered alphas.

    Returns (z_T scalar int32, psi (T-1, K) int32) where
    psi[t, k] ~ p(z_t | z_{t+1}=k, x_{1:t}); masked steps carry the state
    through unchanged (identity map).

    Filtered alphas are unnormalized and grow ~O(T in log mass); at the
    T~1e5 design point their f32 magnitude (~1e5-1e6, ULP ~1e-2..1e-1)
    would quantize away the O(1) Gumbel noise inside the categorical
    draws, biasing samples toward argmax. Categorical draws are invariant
    to per-row shifts, so the row max is subtracted FIRST — every logit
    entering a draw is then O(local range).
    """
    K = lp.shape[-1]
    k_last, k_maps = jax.random.split(key)
    last = log_alpha[-1]
    z_T = jax.random.categorical(k_last, last - jnp.max(last)).astype(jnp.int32)

    # logits over the predecessor, batched over (t, successor)
    logits = jnp.swapaxes(log_alpha[:-1, :, None] + lp, 1, 2)  # (T-1, to, from)
    shift = jnp.max(logits, axis=-1, keepdims=True)
    # a row can be all -inf for an unreachable successor; its draw is never
    # consumed, but keep the logits NaN-free
    shift = jnp.where(jnp.isfinite(shift), shift, 0.0)
    psi = jax.random.categorical(k_maps, logits - shift, axis=-1).astype(jnp.int32)
    idx = jax.lax.broadcasted_iota(jnp.int32, psi.shape, 1)
    return z_T, jnp.where(mask[1:, None] > 0, psi, idx)


def sample_posterior(key, log_pi0, log_P, log_lik, mask=None, parallel=False):
    """Draw z ~ p(z | observations): forward filter, backward sample (FFBS).

    The backward pass presamples, for every timestep and every possible
    successor state k, a predecessor  psi_t(k) ~ p(z_t | z_{t+1}=k, x_{1:t})
    (one batched categorical draw — each map entry uses independent Gumbel
    noise and only the entry at the realized successor is ever consumed, so
    the composed path has exactly the FFBS joint distribution). The
    realized path is then the same index-map composition as the Viterbi
    backtrace: a T-step integer scan, or with ``parallel=True`` the
    pointer-doubling suffix scan at O(log T) depth — making the *entire*
    posterior draw parallel-depth, where the reference's ssm samples
    sequentially on the host. Masked steps carry the state through
    unchanged. Returns (T,) int32.
    """
    log_pi0 = jnp.asarray(log_pi0)
    log_P = jnp.asarray(log_P)
    log_lik = jnp.asarray(log_lik)
    T, K = log_lik.shape
    if mask is None:
        mask = jnp.ones(T)
    mask = jnp.asarray(mask).astype(log_lik.dtype)

    fwd = forward_parallel if parallel else forward
    log_alpha, _ = fwd(log_pi0, log_P, log_lik, mask)

    lp = jnp.broadcast_to(log_P[None], (T - 1, K, K)) if log_P.ndim == 2 \
        else log_P
    z_T, psi = _presample_path_draws(key, log_alpha, lp, mask)

    if parallel:
        comp = _prefix(_compose_maps, psi, jnp.arange(K, dtype=jnp.int32),
                       reverse=True)
        zs = comp[:, z_T]
    else:
        def back(z_next, ptrs_t):
            z = ptrs_t[z_next]
            return z, z

        _, zs = lax.scan(back, z_T, psi, reverse=True)
    return jnp.concatenate([zs, z_T[None]], axis=0).astype(jnp.int32)


def sample_states(key, log_pi0, log_P, T):
    """Sample a state sequence from the prior (no observations)."""
    k0, k_scan = jax.random.split(key)
    z0 = jax.random.categorical(k0, log_pi0)

    def step(carry, key_t):
        z_prev = carry
        lp = log_P if log_P.ndim == 2 else log_P[0]
        z = jax.random.categorical(key_t, lp[z_prev])
        return z, z

    keys = jax.random.split(k_scan, T - 1)
    _, zs = lax.scan(step, z0, keys)
    return jnp.concatenate([z0[None], zs], axis=0).astype(jnp.int32)


# ----------------------------------------------------------------- parallel
# Parallel-prefix message passing: the TPU-native long-sequence story.
# The forward recursion is a chain of log-space matrix-vector products;
# reassociating it as a scan over (K, K) matrices with the log-matmul
# operator makes the time dimension a parallel prefix (depth log T instead
# of T), and the inner operator runs on the MXU via a max-shifted real
# matmul. Worth it for long trials (reference NP dataset: 1000-frame
# trials, docs/source/data_structure.rst:27).

# very long chains: one monolithic associative_scan program is slow for
# XLA to compile (see ops/scans.py); chunk transparently past this length
_CHUNK_ABOVE = 16384
_CHUNK = 8192


def _prefix(combine, Ms, identity, reverse=False):
    if Ms.shape[0] > _CHUNK_ABOVE:
        return chunked_prefix_scan(combine, Ms, identity, _CHUNK, reverse=reverse)
    return jax.lax.associative_scan(combine, Ms, reverse=reverse)


def _log_matmul(A, B):
    """(..., K, K) log-space matrix product: logsumexp_k A[.., i, k] + B[.., k, j].

    Computed as a max-shifted real matmul so the contraction maps onto the
    MXU: A (x) B = sA + sB + log(exp(A - sA) @ exp(B - sB)).
    """
    sA = jax.lax.stop_gradient(jnp.max(A, axis=-1, keepdims=True))  # (..., K, 1)
    sB = jax.lax.stop_gradient(jnp.max(B, axis=-2, keepdims=True))  # (..., 1, K)
    sA = jnp.where(jnp.isfinite(sA), sA, 0.0)
    sB = jnp.where(jnp.isfinite(sB), sB, 0.0)
    prod = jnp.einsum('...ik,...kj->...ij', jnp.exp(A - sA), jnp.exp(B - sB))
    return sA + sB + jnp.log(jnp.maximum(prod, 1e-38))


def forward_parallel(log_pi0, log_P, log_lik, mask=None):
    """Forward pass via ``lax.associative_scan`` (parallel prefix in log space).

    Mathematically identical to :func:`forward` (up to f32 roundoff); use for
    long trials where the sequential scan's depth dominates. Returns
    (log_alpha (T, K), log_Z).
    """
    T, K = log_lik.shape
    if mask is None:
        mask = jnp.ones(T)
    mask = mask.astype(log_lik.dtype)

    # chain elements: M_t(i, j) = log_P(i, j) + log_lik_t(j), t = 1..T-1
    if log_P.ndim == 2:
        lp = jnp.broadcast_to(log_P[None], (T - 1, K, K))
    else:
        lp = log_P
    Ms = lp + (log_lik[1:] * mask[1:, None])[:, None, :]
    # padded steps contribute the identity element of the log-matmul monoid
    identity = jnp.where(jnp.eye(K) > 0, 0.0, -jnp.inf)
    Ms = jnp.where(mask[1:, None, None] > 0, Ms, identity[None])

    prefix = _prefix(_log_matmul, Ms, identity)  # (T-1, K, K)

    alpha0 = log_pi0 + log_lik[0] * mask[0]
    alphas = logsumexp(alpha0[None, :, None] + prefix, axis=1)  # (T-1, K)
    log_alpha = jnp.concatenate([alpha0[None], alphas], axis=0)
    log_Z = logsumexp(log_alpha[-1])
    return log_alpha, log_Z
