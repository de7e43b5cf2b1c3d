"""Sequence-parallel associative scans over a device mesh (shard_map).

The long-sequence story in this framework is parallel-prefix message
passing (``ops/hmm.py``, ``ops/kalman.py``): the time recursion is
reassociated as an ``associative_scan`` over monoid elements. On one chip
that bounds the *depth* at log T; this module additionally shards the
*time axis itself* across chips, so a single very long trial (the
reference's NP sessions run to 10^5 frames; docs/source/data_structure.rst
describes trials as the batching unit) scales across a slice instead of
being limited to one chip's HBM and FLOPs.

The scheme is the standard three-phase distributed scan:

1. each device runs the (chunk-bounded) local associative scan on its
   contiguous time shard;
2. the per-device totals are ``all_gather``-ed over ICI (one small (K,K)
   or Kalman-element tensor per device — bytes, not the sequence), and a
   tiny n_devices-length scan of those totals gives every device the
   combined prefix of everything to its left (right, for suffix scans);
3. each device folds that offset into its local prefixes.

Communication is O(n_devices * |element|), independent of T — exactly the
pattern XLA's collectives are built for. There is no reference counterpart
(the reference's ssm E-step is a sequential CPU loop; SURVEY §5
"long-sequence handling").
"""

import jax
import jax.numpy as jnp
from jax import lax
from jax.scipy.special import logsumexp
from jax.sharding import PartitionSpec as P
try:
    from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from behavenet_tpu.ops.scans import chunked_prefix_scan
from behavenet_tpu.ops import hmm as hmm_ops

__all__ = ['sp_scan', 'sp_forward_backward', 'sp_viterbi',
           'sp_sample_posterior', 'sp_kalman_filter', 'sp_kalman_smooth']

_tmap = jax.tree_util.tree_map


def _pad_to(elems, identity, total):
    T = jax.tree_util.tree_leaves(elems)[0].shape[0]
    if total == T:
        return elems
    pad = total - T
    return _tmap(
        lambda e, i: jnp.concatenate(
            [e, jnp.broadcast_to(i, (pad,) + i.shape)], axis=0),
        elems, identity)


def sp_scan(combine, elems, identity, mesh, axis_name='sp', reverse=False,
            chunk=None):
    """``lax.associative_scan(combine, elems, reverse=...)``, time-sharded.

    Parameters
    ----------
    combine : associative pytree combine accepting batched elements, with
        the accumulated scan-origin block as its first argument (the
        ``ops/scans.chunked_prefix_scan`` convention).
    elems : pytree of (T, ...) arrays.
    identity : per-element pytree; two-sided identity of ``combine`` (used
        to pad T to a multiple of the mesh axis and to seed edge devices).
    mesh : ``jax.sharding.Mesh`` containing ``axis_name``.
    chunk : optional within-device chunk bound (see ``chunked_prefix_scan``);
        defaults to the HMM engine's compile-bounding chunk policy.

    Returns the inclusive scan with the same leading length T, identical
    to the single-device result up to float reassociation roundoff.
    """
    n = mesh.shape[axis_name]
    T = jax.tree_util.tree_leaves(elems)[0].shape[0]
    total = -(-T // n) * n
    elems = _pad_to(elems, identity, total)

    def shard_fn(local):
        # 1. local inclusive scan on this device's contiguous time shard
        if chunk is not None:
            within = chunked_prefix_scan(combine, local, identity, chunk,
                                         reverse=reverse)
        else:
            within = chunked_prefix_scan(combine, local, identity,
                                         hmm_ops._CHUNK, reverse=reverse)
        # 2. gather per-device totals; tiny n-length scan of them
        mine = _tmap(lambda w: w[0] if reverse else w[-1], within)
        totals = _tmap(lambda m: lax.all_gather(m, axis_name), mine)  # (n, ...)
        scanned = lax.associative_scan(combine, totals, reverse=reverse)
        i = lax.axis_index(axis_name)
        if reverse:
            idx = jnp.minimum(i + 1, n - 1)
            off = _tmap(
                lambda s, idn: jnp.where(
                    i < n - 1,
                    lax.dynamic_index_in_dim(s, idx, 0, keepdims=False), idn),
                scanned, identity)
        else:
            idx = jnp.maximum(i - 1, 0)
            off = _tmap(
                lambda s, idn: jnp.where(
                    i > 0,
                    lax.dynamic_index_in_dim(s, idx, 0, keepdims=False), idn),
                scanned, identity)
        # 3. fold the cross-device offset into the local prefixes
        m = total // n
        off_b = _tmap(lambda o: jnp.broadcast_to(o, (m,) + o.shape), off)
        return combine(off_b, within)

    try:  # jax >= 0.8 signature
        run = shard_map(shard_fn, mesh=mesh, in_specs=P(axis_name),
                        out_specs=P(axis_name), check_vma=False)
    except TypeError:  # pragma: no cover — older jax
        run = shard_map(shard_fn, mesh=mesh, in_specs=P(axis_name),
                        out_specs=P(axis_name), check_rep=False)
    out = run(elems)
    return _tmap(lambda o: o[:T], out)


def _hmm_chain(log_P, log_lik, mask):
    """Chain operators M_t (+ the monoid identity) shared by the sp passes."""
    T, K = log_lik.shape
    lp = jnp.broadcast_to(log_P[None], (T - 1, K, K)) if log_P.ndim == 2 else log_P
    Ms = lp + (log_lik[1:] * mask[1:, None])[:, None, :]
    identity = jnp.where(jnp.eye(K) > 0, 0.0, -jnp.inf)
    Ms = jnp.where(mask[1:, None, None] > 0, Ms, identity[None])
    return lp, Ms, identity


def _sp_alphas(log_pi0, log_lik, mask, Ms, identity, mesh, axis_name):
    """Filtered log-alphas (T, K) via the time-sharded log-matmul prefix."""
    prefix = sp_scan(hmm_ops._log_matmul, Ms, identity, mesh,
                     axis_name=axis_name)
    alpha0 = log_pi0 + log_lik[0] * mask[0]
    alphas = logsumexp(alpha0[None, :, None] + prefix, axis=1)
    return jnp.concatenate([alpha0[None], alphas], axis=0)


def sp_forward_backward(log_pi0, log_P, log_lik, mask=None, mesh=None,
                        axis_name='sp'):
    """HMM posteriors with both message passes time-sharded over ``mesh``.

    Same contract and results (up to f32 reassociation) as
    ``ops.hmm.forward_backward(..., parallel=True)``; the (T-1, K, K)
    chain-operator scans run sequence-parallel via :func:`sp_scan`.
    Returns (gamma (T, K), log_Z, xi_sum (K, K)).
    """
    T, K = log_lik.shape
    if mask is None:
        mask = jnp.ones(T)
    mask = mask.astype(log_lik.dtype)

    lp, Ms, identity = _hmm_chain(log_P, log_lik, mask)
    log_alpha = _sp_alphas(log_pi0, log_lik, mask, Ms, identity, mesh,
                           axis_name)
    log_Z = logsumexp(log_alpha[-1])

    suffix_T = sp_scan(hmm_ops._log_matmul, jnp.swapaxes(Ms, 1, 2), identity,
                       mesh, axis_name=axis_name, reverse=True)
    betas = logsumexp(jnp.swapaxes(suffix_T, 1, 2), axis=2)
    log_beta = jnp.concatenate(
        [betas, jnp.zeros((1, K), dtype=log_lik.dtype)], axis=0)

    log_gamma = log_alpha + log_beta
    log_gamma = log_gamma - jnp.max(log_gamma, axis=1, keepdims=True)
    log_gamma = log_gamma - logsumexp(log_gamma, axis=1, keepdims=True)
    gamma = jnp.exp(log_gamma) * mask[:, None]

    log_xi = (log_alpha[:-1, :, None] + lp
              + (log_lik[1:] * mask[1:, None] + log_beta[1:])[:, None, :])
    log_xi = log_xi - jnp.max(log_xi, axis=(1, 2), keepdims=True)
    log_xi = log_xi - logsumexp(log_xi, axis=(1, 2), keepdims=True)
    pair_mask = (mask[:-1] * mask[1:])[:, None, None]
    xi_sum = jnp.sum(jnp.exp(log_xi) * pair_mask, axis=0)
    return gamma, log_Z, xi_sum


def sp_viterbi(log_pi0, log_P, log_lik, mask=None, mesh=None, axis_name='sp'):
    """Most likely state sequence with the (max, +) scans time-sharded.

    Mirrors ``ops.hmm.viterbi_parallel`` (same chain elements, same
    pointer-doubling backtrace) with both the delta prefix and the
    backpointer-composition suffix running through :func:`sp_scan`.
    """
    T, K = log_lik.shape
    if mask is None:
        mask = jnp.ones(T)
    mask = mask.astype(log_lik.dtype)

    lp, Ms, identity = _hmm_chain(log_P, log_lik, mask)
    prefix = sp_scan(hmm_ops._maxplus_matmul, Ms, identity, mesh,
                     axis_name=axis_name)
    delta0 = log_pi0 + log_lik[0] * mask[0]
    deltas = jnp.max(delta0[None, :, None] + prefix, axis=1)
    delta = jnp.concatenate([delta0[None], deltas], axis=0)

    scores = delta[:-1, :, None] + lp
    psi = jnp.argmax(scores, axis=1).astype(jnp.int32)
    idx = jax.lax.broadcasted_iota(jnp.int32, (T - 1, K), 1)
    psi = jnp.where(mask[1:, None] > 0, psi, idx)

    z_T = jnp.argmax(delta[-1]).astype(jnp.int32)

    comp = sp_scan(hmm_ops._compose_maps, psi, jnp.arange(K, dtype=jnp.int32),
                   mesh, axis_name=axis_name, reverse=True)
    zs = comp[:, z_T]
    return jnp.concatenate([zs, z_T[None]], axis=0).astype(jnp.int32)


def sp_sample_posterior(key, log_pi0, log_P, log_lik, mask=None, mesh=None,
                        axis_name='sp'):
    """FFBS posterior draw with both passes time-sharded over ``mesh``.

    Same construction as ``ops.hmm.sample_posterior(parallel=True)`` — the
    filtered-alpha prefix and the presampled predecessor-map composition
    both run through :func:`sp_scan`. Returns (T,) int32.
    """
    T, K = log_lik.shape
    if mask is None:
        mask = jnp.ones(T)
    mask = mask.astype(log_lik.dtype)

    lp, Ms, identity = _hmm_chain(log_P, log_lik, mask)
    log_alpha = _sp_alphas(log_pi0, log_lik, mask, Ms, identity, mesh,
                           axis_name)
    z_T, psi = hmm_ops._presample_path_draws(key, log_alpha, lp, mask)

    comp = sp_scan(hmm_ops._compose_maps, psi, jnp.arange(K, dtype=jnp.int32),
                   mesh, axis_name=axis_name, reverse=True)
    zs = comp[:, z_T]
    return jnp.concatenate([zs, z_T[None]], axis=0).astype(jnp.int32)


def sp_kalman_filter(F, c, Q, H, R, y, mask, m0, P0, mesh, axis_name='sp',
                     chunk=None):
    """Parallel-prefix Kalman filter with the time axis mesh-sharded.

    Same contract and results (up to f32 reassociation) as
    ``ops.kalman.filter_parallel``: the five-tuple Sarkka &
    Garcia-Fernandez filtering elements scan through :func:`sp_scan`
    instead of a single-device ``associative_scan``. Returns (ms, Ps).
    """
    from behavenet_tpu.ops import kalman
    n = F.shape[1]
    elems = kalman._filter_elements(F, c, Q, H, R, y, mask, m0, P0)
    combine = lambda e1, e2: kalman._filter_combine(tuple(e1), tuple(e2))
    identity = (jnp.eye(n), jnp.zeros(n), jnp.zeros((n, n)),
                jnp.zeros(n), jnp.zeros((n, n)))
    _, b, C, _, _ = sp_scan(combine, elems, identity, mesh,
                            axis_name=axis_name, chunk=chunk)
    return b, C


def sp_kalman_smooth(F, c, Q, ms, Ps, mesh, axis_name='sp', chunk=None):
    """Parallel-prefix RTS smoother with the time axis mesh-sharded.

    Mirrors ``ops.kalman.smooth_parallel`` (same three-tuple suffix
    elements) over :func:`sp_scan` in reverse. Returns (ms_s, Ps_s).
    """
    from behavenet_tpu.ops import kalman
    n = ms.shape[1]
    E, g, L = kalman._smooth_elements(F, c, Q, ms, Ps)
    identity = (jnp.eye(n), jnp.zeros(n), jnp.zeros((n, n)))
    _, g, L = sp_scan(kalman._smooth_combine, (E, g, L), identity, mesh,
                      axis_name=axis_name, reverse=True, chunk=chunk)
    return g, L
