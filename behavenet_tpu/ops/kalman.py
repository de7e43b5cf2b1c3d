"""Kalman filtering/smoothing: sequential scans + parallel associative scans.

TPU-native long-sequence inference for linear-Gaussian state-space models:

    x_t = F_t x_{t-1} + c_t + w_t,   w_t ~ N(0, Q_t)      (t = 1..T-1)
    x_0 ~ N(F_0 m0 + c_0, F_0 P0 F_0^T + Q_0)
    y_t = H x_t + v_t,               v_t ~ N(0, R)        (t = 0..T-1)

(Pass F_0 = I, c_0 = 0, Q_0 ~ 0 to use N(m0, P0) directly as the prior for
x_0.) ``mask`` marks timesteps with an observation; masked-out steps are
pure predictions.

The parallel pass reassociates the filtering/smoothing recursions as
``lax.associative_scan`` prefix products of five-tuple (filter) and
three-tuple (smoother) elements — the temporal-parallelization construction
of Sarkka & Garcia-Fernandez (IEEE TAC 2021, arXiv:1905.13002) — giving
depth O(log T) with batched (n, n) solves on the MXU. Used by
:class:`behavenet_tpu.models.bayesian.BayesianDecoder` for long trials; the
reference has no analogue (its Bayesian decoder is unimplemented,
docs "Coming soon").
"""

import jax
import jax.numpy as jnp
from jax import lax

from behavenet_tpu.ops.smallmat import solve_small
from behavenet_tpu.ops.scans import chunked_prefix_scan as _chunked_prefix_scan

__all__ = ['filter_sequential', 'filter_parallel',
           'smooth_sequential', 'smooth_parallel']


def _sym(M):
    return 0.5 * (M + jnp.swapaxes(M, -1, -2))


def filter_sequential(F, c, Q, H, R, y, mask, m0, P0):
    """Standard Kalman filter as a lax.scan.

    Shapes: F (T,n,n), c (T,n), Q (T,n,n), H (d,n), R (d,d), y (T,d),
    mask (T,), m0 (n,), P0 (n,n). Returns (ms (T,n), Ps (T,n,n),
    m_pred (T,n), P_pred (T,n,n)).
    """
    d = y.shape[1]
    I_d = jnp.eye(d)

    def update(m_p, P_p, y_t, msk):
        S = H @ P_p @ H.T + R
        K = solve_small(S, H @ P_p).T  # (n, d)
        m_u = m_p + K @ (y_t - H @ m_p)
        P_u = _sym(P_p - K @ H @ P_p)
        m_new = jnp.where(msk > 0, m_u, m_p)
        P_new = jnp.where(msk > 0, P_u, P_p)
        return m_new, P_new

    def step(carry, inp):
        m, P = carry
        F_t, c_t, Q_t, y_t, msk = inp
        m_p = F_t @ m + c_t
        P_p = _sym(F_t @ P @ F_t.T + Q_t)
        m_f, P_f = update(m_p, P_p, y_t, msk)
        return (m_f, P_f), (m_f, P_f, m_p, P_p)

    (_, _), (ms, Ps, m_pred, P_pred) = lax.scan(
        step, (m0, P0), (F, c, Q, y, mask))
    return ms, Ps, m_pred, P_pred


def _filter_elements(F, c, Q, H, R, y, mask, m0, P0):
    """Per-timestep associative filtering elements (A, b, C, eta, J)."""
    T, d = y.shape
    n = F.shape[1]

    def make_elem(F_t, c_t, Q_t, y_t, msk):
        S = H @ Q_t @ H.T + R                        # (d, d)
        K = solve_small(S, H @ Q_t).T           # (n, d)
        A = F_t - K @ H @ F_t
        b = c_t + K @ (y_t - H @ c_t)
        C = _sym(Q_t - K @ H @ Q_t)
        HS = solve_small(S, H @ F_t)            # S^{-1} H F  (d, n)
        eta = HS.T @ (y_t - H @ c_t)
        J = _sym(HS.T @ (H @ F_t))
        # masked step: pure prediction element
        A = jnp.where(msk > 0, A, F_t)
        b = jnp.where(msk > 0, b, c_t)
        C = jnp.where(msk > 0, C, Q_t)
        eta = jnp.where(msk > 0, eta, jnp.zeros(n))
        J = jnp.where(msk > 0, J, jnp.zeros((n, n)))
        return A, b, C, eta, J

    A, b, C, eta, J = jax.vmap(make_elem)(F, c, Q, y, mask)

    # element 0 absorbs the prior: predict through (F_0, c_0, Q_0), update
    m_p0 = F[0] @ m0 + c[0]
    P_p0 = _sym(F[0] @ P0 @ F[0].T + Q[0])
    S0 = H @ P_p0 @ H.T + R
    K0 = solve_small(S0, H @ P_p0).T
    b0_u = m_p0 + K0 @ (y[0] - H @ m_p0)
    C0_u = _sym(P_p0 - K0 @ H @ P_p0)
    b0 = jnp.where(mask[0] > 0, b0_u, m_p0)
    C0 = jnp.where(mask[0] > 0, C0_u, P_p0)
    A = A.at[0].set(jnp.zeros((n, n)))
    b = b.at[0].set(b0)
    C = C.at[0].set(C0)
    eta = eta.at[0].set(jnp.zeros(n))
    J = J.at[0].set(jnp.zeros((n, n)))
    return A, b, C, eta, J


def _filter_combine(e1, e2):
    """Associative filtering-element combination (Sarkka & G-F eq. 10-11)."""
    A1, b1, C1, eta1, J1 = e1
    A2, b2, C2, eta2, J2 = e2
    n = A1.shape[-1]
    I = jnp.eye(n)
    # M = (I + C1 J2)^{-1}; N = (I + J2 C1)^{-1} = M^T (C, J symmetric).
    # The lhs is nonsymmetric (invertible since eig(C1 J2) >= 0, but its
    # leading minors are not guaranteed nonsingular) -> pivoted solve.
    lhs = I + C1 @ J2
    M = solve_small(lhs, jnp.broadcast_to(I, lhs.shape), pivot=True)
    A = A2 @ M @ A1
    b = (A2 @ M @ (b1[..., None] + C1 @ eta2[..., None]))[..., 0] + b2
    C = _sym(A2 @ M @ C1 @ jnp.swapaxes(A2, -1, -2) + C2)
    N = jnp.swapaxes(M, -1, -2)
    eta = (jnp.swapaxes(A1, -1, -2) @ N @
           (eta2[..., None] - J2 @ b1[..., None]))[..., 0] + eta1
    J = _sym(jnp.swapaxes(A1, -1, -2) @ N @ J2 @ A1 + J1)
    return A, b, C, eta, J


def filter_parallel(F, c, Q, H, R, y, mask, m0, P0, chunk=None):
    """Parallel-prefix Kalman filter (depth O(log T)).

    Same results as :func:`filter_sequential` up to f32 roundoff. Returns
    (ms, Ps) — prediction-path byproducts are not materialized here; use
    :func:`smooth_parallel` for smoothing. ``chunk`` bounds compile time
    for very long T (see :func:`_chunked_prefix_scan`).
    """
    n = F.shape[1]
    elems = _filter_elements(F, c, Q, H, R, y, mask, m0, P0)
    combine = lambda e1, e2: _filter_combine(tuple(e1), tuple(e2))
    if chunk:
        identity = (jnp.eye(n), jnp.zeros(n), jnp.zeros((n, n)),
                    jnp.zeros(n), jnp.zeros((n, n)))
        A, b, C, eta, J = _chunked_prefix_scan(combine, elems, identity, chunk)
    else:
        A, b, C, eta, J = lax.associative_scan(combine, elems)
    return b, C


def smooth_sequential(F, c, Q, ms, Ps, m_pred, P_pred):
    """RTS smoother as a reverse lax.scan over filtered/predicted moments.

    ``m_pred[t], P_pred[t]`` are the one-step-ahead moments used to produce
    ``ms[t]`` (i.e. prediction from t-1 through F_t). Returns (ms_s, Ps_s).
    """
    n = F.shape[1]

    def step(carry, inp):
        m_next, P_next = carry
        m_f, P_f, F_n, m_pn, P_pn = inp
        G = solve_small(P_pn + 1e-8 * jnp.eye(n), F_n @ P_f).T
        m_s = m_f + G @ (m_next - m_pn)
        P_s = _sym(P_f + G @ (P_next - P_pn) @ G.T)
        return (m_s, P_s), (m_s, P_s)

    init = (ms[-1], Ps[-1])
    (_, _), (ms_s, Ps_s) = lax.scan(
        step, init, (ms[:-1], Ps[:-1], F[1:], m_pred[1:], P_pred[1:]),
        reverse=True)
    ms_s = jnp.concatenate([ms_s, ms[-1:]], axis=0)
    Ps_s = jnp.concatenate([Ps_s, Ps[-1:]], axis=0)
    return ms_s, Ps_s


def _smooth_combine(later, earlier):
    """Associative smoothing-element combination.

    ``lax.associative_scan(reverse=True)`` reverses, forward-scans, and
    reverses back, so the FIRST argument is the already-combined suffix
    (later timesteps) and the SECOND the earlier element. The paper's
    combination a_early (*) a_late is therefore applied with the roles
    read from the argument order (earlier, later) = (2nd, 1st):
    E = E_e E_l, g = E_e g_l + g_e, L = E_e L_l E_e^T + L_e.
    """
    E_l, g_l, L_l = later
    E_e, g_e, L_e = earlier
    E = E_e @ E_l
    g = (E_e @ g_l[..., None])[..., 0] + g_e
    L = _sym(E_e @ L_l @ jnp.swapaxes(E_e, -1, -2) + L_e)
    return E, g, L


def _smooth_elements(F, c, Q, ms, Ps):
    """Per-timestep associative smoothing elements (E, g, L)."""
    n = ms.shape[1]

    def make_elem(m_f, P_f, F_n, c_n, Q_n):
        P_pred = _sym(F_n @ P_f @ F_n.T + Q_n)
        E = solve_small(P_pred + 1e-8 * jnp.eye(n), F_n @ P_f).T
        g = m_f - E @ (F_n @ m_f + c_n)
        L = _sym(P_f - E @ F_n @ P_f)
        return E, g, L

    E, g, L = jax.vmap(make_elem)(ms[:-1], Ps[:-1], F[1:], c[1:], Q[1:])
    # terminal element: identity suffix at T-1
    E = jnp.concatenate([E, jnp.zeros((1, n, n))], axis=0)
    g = jnp.concatenate([g, ms[-1:]], axis=0)
    L = jnp.concatenate([L, Ps[-1:]], axis=0)
    return E, g, L


def smooth_parallel(F, c, Q, ms, Ps, chunk=None):
    """Parallel-prefix RTS smoother over filtered moments (ms, Ps).

    Returns (ms_s, Ps_s); matches :func:`smooth_sequential` up to roundoff.
    ``chunk`` bounds compile time for very long T.
    """
    n = ms.shape[1]
    E, g, L = _smooth_elements(F, c, Q, ms, Ps)
    if chunk:
        identity = (jnp.eye(n), jnp.zeros(n), jnp.zeros((n, n)))
        E, g, L = _chunked_prefix_scan(
            _smooth_combine, (E, g, L), identity, chunk, reverse=True)
    else:
        E, g, L = lax.associative_scan(_smooth_combine, (E, g, L), reverse=True)
    return g, L
