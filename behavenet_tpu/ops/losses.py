"""Loss zoo (JAX) with the reference's exact formulas.

Reference: behavenet/fitting/losses.py. All functions are pure jnp and safe
under jit/grad. The minibatch KL-decomposition estimators follow Chen et al
2018 (arXiv 1802.04942) and keep the reference's O(B^2 d) pairwise
log-density structure — a single fused logsumexp pipeline which XLA maps
well onto the VPU/MXU.
"""

import jax
import jax.numpy as jnp
import numpy as np

from behavenet_tpu.ops import smallmat

__all__ = [
    'mse', 'gaussian_ll', 'gaussian_ll_to_mse', 'kl_div_to_std_normal',
    'index_code_mi', 'total_correlation', 'dimension_wise_kl_to_std_normal',
    'decomposed_kl', 'subspace_overlap', 'triplet_loss', 'gaussian_neg_log_prob',
]

LN2PI = float(np.log(2 * np.pi))


def mse(y_pred, y_true, masks=None, frame_mask=None):
    """Masked mean square error over all elements (reference losses.py:36).

    ``frame_mask`` (B,) marks real frames in a padded-to-bucket batch; the
    mean then runs over valid frames only (exactly the reference value on
    the unpadded batch).
    """
    d = (y_pred - y_true) ** 2
    if masks is not None:
        d = d * masks
    if frame_mask is None:
        return jnp.mean(d)
    axes = tuple(range(1, d.ndim))
    per_frame = jnp.mean(d, axis=axes)
    return jnp.sum(per_frame * frame_mask) / jnp.maximum(jnp.sum(frame_mask), 1.0)


def gaussian_ll(y_pred, y_mean, masks=None, std=1.0, frame_mask=None):
    """Diagonal-Gaussian log-likelihood, summed over dims, mean over batch.

    (reference losses.py:62-96; fixed std for all dims). ``frame_mask``
    restricts the batch mean to real frames of a padded batch.
    """
    n_dims = int(np.prod(y_pred.shape[1:]))
    log_var = np.log(std ** 2)
    diff_sq = (y_pred - y_mean) ** 2
    if masks is not None:
        diff_sq = diff_sq * masks
    axes = tuple(range(1, y_pred.ndim))
    ll = -(0.5 * LN2PI + 0.5 * log_var) * n_dims \
        - (0.5 / (std ** 2)) * jnp.sum(diff_sq, axis=axes)
    if frame_mask is None:
        return jnp.mean(ll)
    return jnp.sum(ll * frame_mask) / jnp.maximum(jnp.sum(frame_mask), 1.0)


def gaussian_ll_to_mse(ll, n_dims, gaussian_std=1.0, mse_std=1.0):
    """Convert Gaussian LL to the equivalent MSE (reference losses.py:99)."""
    llc = np.copy(ll)
    llc = llc + (0.5 * LN2PI + 0.5 * np.log(gaussian_std ** 2)) * n_dims
    llc = llc * -(gaussian_std ** 2) / 0.5
    llc = llc / n_dims
    llc = llc * 1.0 / (mse_std ** 2)
    return llc


def kl_div_to_std_normal(mu, logvar, frame_mask=None):
    """KL(N(mu, exp(logvar)) || N(0,1)), summed dims / mean batch (reference :130)."""
    kl = 0.5 * jnp.sum(jnp.exp(logvar) - logvar + mu ** 2 - 1, axis=1)
    if frame_mask is None:
        return jnp.mean(kl)
    return jnp.sum(kl * frame_mask) / jnp.maximum(jnp.sum(frame_mask), 1.0)


def _log_density_gaussian(z, mu, logvar):
    """Elementwise diagonal-Gaussian log density (reference :354)."""
    diff_sq = (z - mu) ** 2
    inv_var = jnp.exp(-logvar)
    return -0.5 * (inv_var * diff_sq + logvar + LN2PI)


def _log_density_std_normal(z):
    return -0.5 * (z ** 2 + LN2PI)


def _pairwise_log_qz(z, mu, logvar):
    """(B, B, D) tensor of log q(z(x_j)_l | x_i), indexed [j, i, l]."""
    return _log_density_gaussian(z[:, None], mu[None, :], logvar[None, :])


def index_code_mi(z, mu, logvar):
    """Minibatch estimate of index-code mutual information (reference :150)."""
    log_qz_prob = _pairwise_log_qz(z, mu, logvar)
    summed = jnp.sum(log_qz_prob, axis=2)
    log_qz = jax.scipy.special.logsumexp(summed, axis=1)
    log_qz_cond = jnp.diagonal(summed)
    return jnp.mean(log_qz_cond - log_qz)


def total_correlation(z, mu, logvar):
    """Minibatch estimate of total correlation (reference :192)."""
    log_qz_prob = _pairwise_log_qz(z, mu, logvar)
    log_qz_product = jnp.sum(jax.scipy.special.logsumexp(log_qz_prob, axis=1), axis=1)
    log_qz = jax.scipy.special.logsumexp(jnp.sum(log_qz_prob, axis=2), axis=1)
    return jnp.mean(log_qz - log_qz_product)


def dimension_wise_kl_to_std_normal(z, mu, logvar):
    """Minibatch estimate of dimension-wise KL to N(0,1) (reference :244)."""
    log_qz_prob = _pairwise_log_qz(z, mu, logvar)
    log_qz_product = jnp.sum(jax.scipy.special.logsumexp(log_qz_prob, axis=1), axis=1)
    log_pz_product = jnp.sum(_log_density_std_normal(z), axis=1)
    return jnp.mean(log_qz_product - log_pz_product)


def decomposed_kl(z, mu, logvar, frame_mask=None):
    """KL decomposition into (MI, TC, dimension-wise KL) (reference :284-351).

    Computes the pairwise log-density tensor once and derives all three
    terms from it, matching the three standalone estimators above. With
    ``frame_mask``, padded rows are excluded both as mixture components
    (the logsumexp over the batch) and from the batch means, so the result
    equals the reference value on the unpadded batch (the estimators
    ignore the additive log(B) constant, reference :153-154).
    """
    log_qz_prob = _pairwise_log_qz(z, mu, logvar)
    if frame_mask is not None:
        # invalid components i contribute -inf to the logsumexp over axis 1
        neg_inf = jnp.float32(-1e30)
        log_qz_prob = jnp.where(frame_mask[None, :, None] > 0, log_qz_prob, neg_inf)
    summed = jnp.sum(log_qz_prob, axis=2)
    log_qz = jax.scipy.special.logsumexp(summed, axis=1)
    log_qz_cond = jnp.diagonal(
        jnp.sum(_log_density_gaussian(z[:, None], mu[None, :], logvar[None, :]), axis=2))
    log_qz_product = jnp.sum(jax.scipy.special.logsumexp(log_qz_prob, axis=1), axis=1)
    log_pz_product = jnp.sum(_log_density_std_normal(z), axis=1)

    def _mean(v):
        if frame_mask is None:
            return jnp.mean(v)
        return jnp.sum(v * frame_mask) / jnp.maximum(jnp.sum(frame_mask), 1.0)

    idx_code_mi = _mean(log_qz_cond - log_qz)
    total_corr = _mean(log_qz - log_qz_product)
    dim_wise_kl = _mean(log_qz_product - log_pz_product)
    return idx_code_mi, total_corr, dim_wise_kl


def subspace_overlap(A, B, C=None):
    """Mean squared deviation of U U^T from identity, U = [A; B(; C)] (reference :375)."""
    mats = [A, B] if C is None else [A, B, C]
    U = jnp.concatenate(mats, axis=0)
    d = U.shape[0]
    return jnp.mean((U @ U.T - jnp.eye(d)) ** 2)


def gaussian_neg_log_prob(y_pred, y_true, cov, frame_mask=None):
    """Negative MVN log-probability with learned covariance.

    Matches the reference GaussianNegLogProb module (losses.py:17-33):
    covariance = 1e-3*I + cov; mean over batch. ``cov`` is (d, d) shared or
    (B, d, d) data-dependent (the decoder's per-frame precision head —
    torch's MultivariateNormal broadcasts the batch the same way).
    ``frame_mask`` (B,) restricts the mean to valid rows of a padded batch;
    masked rows' covariances are replaced by I before factorization so pad
    garbage cannot produce NaNs.
    """
    d = y_true.shape[1]
    sigma = 1e-3 * jnp.eye(d) + cov
    diff = y_true - y_pred  # (B, d)
    if sigma.ndim == 2:
        chol = jnp.linalg.cholesky(sigma)
        sol = jax.scipy.linalg.solve_triangular(chol, diff.T, lower=True)  # (d, B)
        maha = jnp.sum(sol ** 2, axis=0)
        logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol)))
    else:
        if frame_mask is not None:
            sigma = jnp.where(frame_mask[:, None, None] > 0, sigma, jnp.eye(d))
        if d <= 16:
            # unrolled small-matrix factorization: XLA's batched cholesky /
            # solve_triangular lower to per-panel loops ~8x slower on TPU.
            # The unroll emits O(d^2) ops at trace time, so large label
            # dimensions fall back to the generic batched path below.
            chol = smallmat.cholesky_small(sigma)  # (B, d, d)
            sol = smallmat.solve_tril_small(chol, diff)
        else:
            chol = jnp.linalg.cholesky(sigma)
            sol = jax.scipy.linalg.solve_triangular(
                chol, diff[..., None], lower=True)[..., 0]
        maha = jnp.sum(sol ** 2, axis=1)
        logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol, axis1=1, axis2=2)), axis=1)
    nll = 0.5 * (d * LN2PI + logdet + maha)
    if frame_mask is None:
        return jnp.mean(nll)
    return jnp.sum(nll * frame_mask) / jnp.maximum(jnp.sum(frame_mask), 1.0)


def _pdist(a, b, eps=1e-6):
    """Row-wise euclidean distance (torch pairwise_distance semantics)."""
    return jnp.sqrt(jnp.sum((a - b + eps) ** 2, axis=1))


def _weighted_mean(vals, w):
    if w is None:
        return jnp.mean(vals)
    return jnp.sum(vals * w) / jnp.maximum(jnp.sum(w), 1.0)


def _triplet_margin(anchor, positive, negative, margin=1.0, w=None):
    """torch TripletMarginLoss with p=2, mean reduction (optionally weighted)."""
    d_ap = _pdist(anchor, positive)
    d_an = _pdist(anchor, negative)
    return _weighted_mean(jnp.maximum(d_ap - d_an + margin, 0.0), w)


# chunk-pairing patterns per dataset count (the reference's hand-enumerated
# triplets, losses.py:402-511, as data):
# triplets: (anchor_ds, anchor_chunk, positive_chunk, negative_ds, negative_chunk)
# pulls:    (ds, chunk_i, chunk_j) within-session attraction terms
_TRIPLET_PATTERNS = {
    2: {'n_chunks': 3,
        'triplets': [(0, 0, 1, 1, 2), (1, 0, 1, 0, 2)],
        'pulls': [(0, 0, 1), (1, 0, 1)],
        # reference keeps this legacy normalization (losses.py:441)
        'n_terms': 3},
    3: {'n_chunks': 6,
        'triplets': [(0, 0, 1, 1, 4), (0, 2, 3, 2, 4),
                     (1, 0, 1, 0, 4), (1, 2, 3, 2, 5),
                     (2, 0, 1, 0, 5), (2, 2, 3, 1, 5)],
        'pulls': [(ds, 2 * i, 2 * i + 1) for ds in range(3) for i in range(2)],
        'n_terms': 6},
    4: {'n_chunks': 9,
        'triplets': [(0, 0, 1, 1, 6), (0, 2, 3, 2, 6), (0, 4, 5, 3, 6),
                     (1, 0, 1, 0, 6), (1, 2, 3, 2, 7), (1, 4, 5, 3, 7),
                     (2, 0, 1, 0, 7), (2, 2, 3, 1, 7), (2, 4, 5, 3, 8),
                     (3, 0, 1, 0, 8), (3, 2, 3, 1, 8), (3, 4, 5, 2, 8)],
        'pulls': [(ds, 2 * i, 2 * i + 1) for ds in range(4) for i in range(3)],
        'n_terms': 12},
}


def triplet_loss(key, z, seg_lens, margin=1.0, seg_mask=None):
    """Triplet loss separating per-session embedding clusters.

    TPU-native restructuring of the reference's hand-enumerated chunk
    triplets (losses.py:402-511): the batch is a concatenation of
    ``len(seg_lens)`` per-session segments (dataset-major); each segment is
    randomly permuted with the given PRNG key and split into the same
    interleaved chunk pattern as the reference (3/6/9 chunks for 2/3/4
    datasets), truncated to the smallest per-dataset chunk length.

    Parameters
    ----------
    key : jax PRNG key
    z : (sum(seg_lens), d) embeddings, dataset-major
    seg_lens : tuple of int (static) — rows per dataset segment (padded
        rows included when bucketing)
    margin : float
    seg_mask : (sum(seg_lens),) optional 0/1 valid-row mask — a term drops
        out whenever ANY of its rows is padding, so bucketed batches give
        an estimate over valid rows only (identical to exact-shape when the
        mask is all ones)
    """
    n_datasets = len(seg_lens)
    if n_datasets not in _TRIPLET_PATTERNS:
        raise NotImplementedError('triplet loss supports 2-4 datasets')
    pat = _TRIPLET_PATTERNS[n_datasets]
    n_chunks = pat['n_chunks']
    m = min(int(s) // n_chunks for s in seg_lens)
    if m == 0:
        raise ValueError('segments %s too small for %d chunks' % (seg_lens, n_chunks))

    keys = jax.random.split(key, n_datasets)
    chunks = []   # chunks[ds][i] -> (m, d)
    weights = []  # weights[ds][i] -> (m,) or None
    offset = 0
    for ds in range(n_datasets):
        seg = z[offset:offset + int(seg_lens[ds])]
        perm = jax.random.permutation(keys[ds], int(seg_lens[ds]))
        seg = seg[perm]
        chunks.append([seg[i::n_chunks][:m] for i in range(n_chunks)])
        if seg_mask is None:
            weights.append([None] * n_chunks)
        else:
            wseg = seg_mask[offset:offset + int(seg_lens[ds])][perm]
            weights.append([wseg[i::n_chunks][:m] for i in range(n_chunks)])
        offset += int(seg_lens[ds])

    def _w(*parts):
        if seg_mask is None:
            return None
        out = parts[0]
        for p in parts[1:]:
            out = out * p
        return out

    loss = jnp.float32(0.0)
    for a_ds, a_i, p_i, n_ds, n_i in pat['triplets']:
        loss += _triplet_margin(
            chunks[a_ds][a_i], chunks[a_ds][p_i], chunks[n_ds][n_i], margin,
            w=_w(weights[a_ds][a_i], weights[a_ds][p_i], weights[n_ds][n_i]))
    for ds, i, j in pat['pulls']:
        loss += _weighted_mean(_pdist(chunks[ds][i], chunks[ds][j]),
                               _w(weights[ds][i], weights[ds][j]))
    return loss / pat['n_terms']
