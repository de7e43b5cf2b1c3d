"""Bayesian decoder: fuse ARHMM dynamics with neural-decoder outputs.

The reference ships only the data plumbing for this model
(behavenet/data/utils.py:257-298 wires the four signals 'ae_latents',
'ae_predictions', 'arhmm_predictions', 'arhmm_states'; the notebook
examples/04_bayesian_decoder.ipynb is empty and the docs say "Coming
soon"). This module implements it TPU-natively.

Model: a switching linear dynamical system whose discrete dynamics and
per-state AR parameters come from a fitted :class:`behavenet_tpu.models
.arhmm.ARHMM`, observed through two neural decoders:

- continuous pseudo-observations: the neural->latent decoder predictions
  ``y_t`` are treated as noisy measurements of the latent ``x_t`` with
  observation covariance R (estimated from decoder residuals on training
  trials);
- discrete evidence: the neural->state decoder probabilities ``q_t(k)``
  enter the discrete-state forward-backward as extra log-likelihood terms.

AR(L) dynamics for any L are handled in companion form: the continuous
state augments to s_t = [x_t, x_{t-1}, ..., x_{t-L+1}] with block-shift
dynamics and observation matrix H = [I 0 ... 0].

Inference is:

1. discrete posterior gamma_t(k) via log-space forward-backward combining
   ARHMM transitions with both evidence terms;
2. continuous posterior either by a collapsed Gaussian-sum (IMM / GPB1)
   filter + RTS smoother (``lax.scan``, the default), or — for long trials
   — by the parallel associative Kalman filter/smoother of
   :mod:`behavenet_tpu.ops.kalman` over the gamma-weighted (soft) dynamics
   (``decode(parallel=True)``, depth O(log T); drops the IMM mixture-spread
   term, a small approximation when gamma is concentrated).
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from behavenet_tpu.ops import hmm as hmm_ops
from behavenet_tpu.ops import kalman

__all__ = ['BayesianDecoder']


class BayesianDecoder:
    """Fuses an ARHMM prior with neural decoder outputs (any AR lag order)."""

    model_class = 'bayesian-decoding'

    def __init__(self, arhmm, obs_noise=None, state_evidence_weight=1.0):
        """
        Parameters
        ----------
        arhmm : behavenet_tpu.models.arhmm.ARHMM
            fitted segmentation model providing transitions + AR dynamics
        obs_noise : (D, D) array, optional
            observation covariance R of the neural latent predictions; if
            None, call :meth:`estimate_obs_noise` before decoding
        state_evidence_weight : float
            weight on the neural state-decoder log-probabilities
        """
        self.arhmm = arhmm
        self.K = arhmm.K
        self.D = arhmm.D
        self.lags = max(int(arhmm.lags), 1)  # lags=0 -> random walk form, L=1
        self.n = self.D * self.lags          # augmented state dim
        self.state_evidence_weight = float(state_evidence_weight)
        self.R = None if obs_noise is None else jnp.asarray(obs_noise, dtype=jnp.float32)
        self._jit_cache = {}

    def _jitted(self, key, fn):
        """Per-instance jit cache: decode stages compile once per shape."""
        if key not in self._jit_cache:
            self._jit_cache[key] = jax.jit(fn)
        return self._jit_cache[key]

    # ------------------------------------------------------------- setup
    def estimate_obs_noise(self, ae_latents, ae_predictions):
        """Estimate R from decoder residuals on training trials.

        Parameters are lists of (T, D) arrays; NaN rows (lag-trimmed borders
        of prediction exports) are ignored.
        """
        resids = []
        for z, y in zip(ae_latents, ae_predictions):
            z = np.asarray(z, dtype=np.float64)
            y = np.asarray(y, dtype=np.float64)
            good = ~np.any(np.isnan(y), axis=1) & ~np.any(np.isnan(z), axis=1)
            resids.append((y - z)[good])
        r = np.vstack(resids)
        R = np.cov(r.T) + 1e-6 * np.eye(self.D)
        self.R = jnp.asarray(np.atleast_2d(R), dtype=jnp.float32)
        return self.R

    @property
    def _H(self):
        """(D, n) observation matrix picking x_t out of the companion state."""
        return jnp.eye(self.D, self.n)

    def _ar_weights(self):
        """(K, D, D*L) AR weight blocks [A_1 ... A_L] (zeros for lags=0)."""
        p = self.arhmm.params
        if self.arhmm.lags == 0:
            return jnp.zeros((self.K, self.D, self.n))
        return p['As']

    def _aug_dynamics(self):
        """Companion-form per-state dynamics (A (K,n,n), b (K,n), Q (K,n,n))."""
        p = self.arhmm.params
        D, L, K, n = self.D, self.lags, self.K, self.n
        A_top = self._ar_weights()                       # (K, D, n)
        shift = jnp.zeros((n - D, n)).at[:, :n - D].set(jnp.eye(n - D)) \
            if L > 1 else jnp.zeros((0, n))
        As = jnp.concatenate(
            [A_top, jnp.broadcast_to(shift[None], (K, n - D, n))], axis=1)
        bs = jnp.concatenate([p['bs'], jnp.zeros((K, n - D))], axis=1)
        Qs = jnp.zeros((K, n, n)) + 1e-6 * jnp.eye(n)[None]
        Qs = Qs.at[:, :D, :D].add(p['Sigmas'])
        return As, bs, Qs

    # ----------------------------------------------------------- decoding
    def states_posterior(self, ae_predictions=None, arhmm_predictions=None):
        """Discrete posterior gamma (T, K) from transitions + neural evidence."""
        ll = self._discrete_loglik(ae_predictions, arhmm_predictions)
        log_P = jax.nn.log_softmax(self.arhmm.params['log_Ps'], axis=1)
        gamma, _, _ = hmm_ops.forward_backward(
            self.arhmm.params['log_pi0'], log_P, ll)
        return np.asarray(gamma)

    def _discrete_loglik(self, ae_predictions, arhmm_predictions):
        terms = []
        if arhmm_predictions is not None:
            q = jnp.asarray(arhmm_predictions, dtype=jnp.float32)
            # NaN rows (lag-trimmed borders of prediction exports) carry no
            # evidence: log 1 = 0
            q = jnp.where(jnp.isnan(q), 1.0, q)
            terms.append(self.state_evidence_weight * jnp.log(jnp.clip(q, 1e-6)))
        if ae_predictions is not None:
            # continuous evidence enters the discrete chain through the
            # per-state one-step predictive likelihood of y_t under
            # (A_k, b_k, Q_k + R), with the AR history read from y itself
            y = jnp.asarray(ae_predictions, dtype=jnp.float32)
            Qs = self.arhmm.params['Sigmas']
            covs = Qs + self.R[None]
            chol = jnp.linalg.cholesky(covs + 1e-6 * jnp.eye(self.D)[None])
            Linv = jax.vmap(lambda c: jax.scipy.linalg.solve_triangular(
                c, jnp.eye(self.D), lower=True))(chol)
            logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol, axis1=1, axis2=2)), axis=1)
            if self.arhmm.lags == 0:
                mus = jnp.broadcast_to(
                    self.arhmm.params['bs'][None], (y.shape[0], self.K, self.D))
            else:
                # lagged history with the first rows clamped to y[0]
                feats = jnp.concatenate(
                    [jnp.concatenate([jnp.tile(y[:1], (l, 1)), y[:-l]], axis=0)
                     for l in range(1, self.lags + 1)], axis=1)  # (T, D*L)
                mus = jnp.einsum('kdp,tp->tkd', self._ar_weights(), feats) \
                    + self.arhmm.params['bs'][None]
            diff = y[:, None, :] - mus
            sol = jnp.einsum('kde,tke->tkd', Linv, diff)
            maha = jnp.sum(sol ** 2, axis=2)
            terms.append(-0.5 * (self.D * np.log(2 * np.pi) + logdet[None] + maha))
        if not terms:
            raise ValueError('need at least one of ae_predictions / arhmm_predictions')
        return sum(terms)

    def decode(self, ae_predictions, arhmm_predictions=None, smooth=True,
               parallel=False, mesh=None, as_numpy=True):
        """Decode latents + states from neural predictions for one trial.

        Parameters
        ----------
        ae_predictions : (T, D)
            neural->latent decoder output (NaN border rows are filled by
            the prior dynamics)
        arhmm_predictions : (T, K), optional
            neural->state decoder probabilities
        smooth : bool
            run the (RTS / associative) backward pass
        parallel : bool
            use the O(log T)-depth associative Kalman over gamma-weighted
            soft dynamics instead of the sequential IMM filter — preferred
            for very long trials; omits the IMM mixture-spread covariance
            term (negligible when the state posterior is concentrated)
        mesh : jax.sharding.Mesh, optional
            a 1-D mesh (any axis name): shard the trial's time axis
            across its chips — every message pass (forward/backward,
            Viterbi, Kalman filter/smoother) runs sequence-parallel via
            ``parallel.seq``. Implies ``parallel=True``.
        as_numpy : bool
            fetch results to host numpy arrays (default). Pass False to
            keep them on device when further JAX computation follows.

        Returns
        -------
        dict with 'latents' (T, D), 'latents_cov' (T, D, D), 'states'
        (T,), 'states_posterior' (T, K)

        Notes
        -----
        Decode stages jit-compile once per trial shape with the current
        ARHMM parameters baked in; build a fresh BayesianDecoder after
        refitting the ARHMM.
        """
        if self.R is None:
            raise RuntimeError('call estimate_obs_noise() or pass obs_noise first')
        y = np.asarray(ae_predictions, dtype=np.float32)
        obs_mask = (~np.any(np.isnan(y), axis=1)).astype(np.float32)
        y = np.nan_to_num(y)

        # discrete pass: parallel-prefix message passing when either the
        # decode or the underlying ARHMM asks for it (long trials). The
        # log-lik, forward-backward, and Viterbi stages compile separately —
        # one combined program at T~100k is disproportionately expensive to
        # compile (three associative scans in one graph) for no run-time win.
        par_scan = bool(parallel or self.arhmm.parallel_scan)
        if mesh is not None:
            parallel = True
        log_pi0 = self.arhmm.params['log_pi0']

        def loglik(y_d, m_d, q_d):
            ll = self._discrete_loglik(
                jnp.where(m_d[:, None] > 0, y_d, 0.0), q_d)
            ll = ll * m_d[:, None]
            log_P = jax.nn.log_softmax(self.arhmm.params['log_Ps'], axis=1)
            return ll, log_P

        def fb(ll, log_P):
            if mesh is not None:
                from behavenet_tpu.parallel.seq import sp_forward_backward
                gamma, _, _ = sp_forward_backward(
                    log_pi0, log_P, ll, mesh=mesh,
                    axis_name=mesh.axis_names[0])
                return gamma
            gamma, _, _ = hmm_ops.forward_backward(
                log_pi0, log_P, ll, parallel=par_scan)
            return gamma

        def vit(ll, log_P):
            if mesh is not None:
                from behavenet_tpu.parallel.seq import sp_viterbi
                return sp_viterbi(log_pi0, log_P, ll, mesh=mesh,
                                  axis_name=mesh.axis_names[0])
            f = hmm_ops.viterbi_parallel if par_scan else hmm_ops.viterbi
            return f(log_pi0, log_P, ll)

        y = jnp.asarray(y)
        obs_mask = jnp.asarray(obs_mask)
        q = None if arhmm_predictions is None else jnp.asarray(arhmm_predictions)
        if q is None:
            ll, log_P = self._jitted(
                ('loglik-noq', y.shape),
                lambda y_d, m_d: loglik(y_d, m_d, None))(y, obs_mask)
        else:
            ll, log_P = self._jitted(('loglik', y.shape), loglik)(y, obs_mask, q)
        gamma = self._jitted(('fb', par_scan, mesh, y.shape), fb)(ll, log_P)
        states = self._jitted(
            ('viterbi', par_scan, mesh, y.shape), vit)(ll, log_P)

        if parallel:
            mus_s, Sigmas_s = self._jitted(
                ('soft-parallel', smooth, mesh, y.shape),
                lambda y_d, m_d, g_d: self._soft_kalman_parallel(
                    y_d, m_d, g_d, smooth, mesh=mesh))(y, obs_mask, gamma)
        else:
            def imm(y_d, m_d, g_d):
                mus_f, Sigmas_f, mus_p, Sigmas_p = self._kalman_filter(y_d, m_d, g_d)
                if smooth:
                    return self._rts_smoother(mus_f, Sigmas_f, mus_p, Sigmas_p, g_d)
                return mus_f, Sigmas_f
            mus_s, Sigmas_s = self._jitted(
                ('imm', smooth, y.shape), imm)(y, obs_mask, gamma)

        D = self.D
        out = {
            'latents': mus_s[:, :D],
            'latents_cov': Sigmas_s[:, :D, :D],
            'states': states,
            'states_posterior': gamma,
        }
        if as_numpy:
            # one forced host fetch per array; with the axon remote tunnel
            # this transfer can dominate decode wall time — pipelines that
            # keep computing in JAX should pass as_numpy=False
            out = {k: np.asarray(v) for k, v in out.items()}
        return out

    def _init_moments(self, y, gamma):
        """Prior moments of the augmented state at t=0."""
        Qs = self.arhmm.params['Sigmas']
        mu0 = jnp.tile(y[0], self.lags)                      # (n,)
        Sigma0 = jnp.kron(jnp.eye(self.lags), self.R) \
            + jnp.kron(jnp.eye(self.lags),
                       jnp.einsum('k,kde->de', gamma[0], Qs))
        return mu0, Sigma0

    def _kalman_filter(self, y, obs_mask, gamma):
        """Soft-weighted (IMM-collapsed) Kalman filter on the companion state."""
        As, bs, Qs = self._aug_dynamics()
        H = self._H
        R = self.R
        n = self.n
        I_n = jnp.eye(n)

        mu0, Sigma0 = self._init_moments(y, gamma)

        def update(mu_pred, Sigma_pred, y_t, m_t):
            S = H @ Sigma_pred @ H.T + R
            Kg = kalman.solve_small(S, H @ Sigma_pred).T      # (n, D)
            mu_upd = mu_pred + Kg @ (y_t - H @ mu_pred)
            Sigma_upd = (I_n - Kg @ H) @ Sigma_pred
            mu_new = jnp.where(m_t > 0, mu_upd, mu_pred)
            Sigma_new = jnp.where(m_t > 0, Sigma_upd, Sigma_pred)
            return mu_new, Sigma_new

        # t = 0: update the prior with the first observation
        mu0, Sigma0 = update(mu0, Sigma0, y[0], obs_mask[0])

        def step(carry, inp):
            mu_prev, Sigma_prev = carry
            y_t, m_t, g_t = inp
            # soft predict: moment-matched mixture over states
            mu_k = jnp.einsum('kde,e->kd', As, mu_prev) + bs  # (K, n)
            mu_pred = jnp.einsum('k,kd->d', g_t, mu_k)
            diff = mu_k - mu_pred[None]
            Sigma_k = jnp.einsum('kde,ef,kgf->kdg', As, Sigma_prev, As) + Qs
            Sigma_pred = jnp.einsum('k,kde->de', g_t, Sigma_k) + \
                jnp.einsum('k,kd,ke->de', g_t, diff, diff)
            mu_new, Sigma_new = update(mu_pred, Sigma_pred, y_t, m_t)
            return (mu_new, Sigma_new), (mu_new, Sigma_new, mu_pred, Sigma_pred)

        (_, _), (mus_f, Sigmas_f, mus_p, Sigmas_p) = lax.scan(
            step, (mu0, Sigma0), (y[1:], obs_mask[1:], gamma[1:]))
        mus_f = jnp.concatenate([mu0[None], mus_f], axis=0)
        Sigmas_f = jnp.concatenate([Sigma0[None], Sigmas_f], axis=0)
        return mus_f, Sigmas_f, mus_p, Sigmas_p

    def _rts_smoother(self, mus_f, Sigmas_f, mus_p, Sigmas_p, gamma):
        """RTS backward pass with the soft-mixture dynamics matrix."""
        As, _, _ = self._aug_dynamics()
        n = self.n

        def step(carry, inp):
            mu_next, Sigma_next = carry
            mu_f, Sigma_f, mu_p, Sigma_p, g_t = inp
            A_soft = jnp.einsum('k,kde->de', g_t, As)
            C = Sigma_f @ A_soft.T
            G = kalman.solve_small(Sigma_p + 1e-6 * jnp.eye(n), C.T).T
            mu_s = mu_f + G @ (mu_next - mu_p)
            Sigma_s = Sigma_f + G @ (Sigma_next - Sigma_p) @ G.T
            return (mu_s, Sigma_s), (mu_s, Sigma_s)

        init = (mus_f[-1], Sigmas_f[-1])
        # inputs at step t: filtered at t, predicted at t+1, gamma at t+1
        (_, _), (mus_s, Sigmas_s) = lax.scan(
            step, init,
            (mus_f[:-1], Sigmas_f[:-1], mus_p, Sigmas_p, gamma[1:]),
            reverse=True)
        mus_s = jnp.concatenate([mus_s, mus_f[-1:]], axis=0)
        Sigmas_s = jnp.concatenate([Sigmas_s, Sigmas_f[-1:]], axis=0)
        return mus_s, Sigmas_s

    def _soft_kalman_parallel(self, y, obs_mask, gamma, smooth, mesh=None):
        """Gamma-weighted time-varying LDS solved with associative scans.

        With ``mesh`` the scans run sequence-parallel over the mesh's
        ``'sp'`` axis (``parallel.seq.sp_kalman_filter/_smooth``).
        """
        As, bs, Qs = self._aug_dynamics()
        F = jnp.einsum('tk,kde->tde', gamma, As)
        c = jnp.einsum('tk,kd->td', gamma, bs)
        Q = jnp.einsum('tk,kde->tde', gamma, Qs)
        mu0, Sigma0 = self._init_moments(y, gamma)
        # element 0 carries the prior straight through: F0 = I, c0 = 0
        n = self.n
        F = F.at[0].set(jnp.eye(n))
        c = c.at[0].set(jnp.zeros(n))
        Q = Q.at[0].set(1e-6 * jnp.eye(n))
        # chunked two-level scans: a single associative scan at T~100k takes
        # XLA many minutes to compile (batched solves at every combine
        # level); chunking bounds compile time at the 8k-program cost while
        # keeping the run O(T/chunk + log chunk) depth
        chunk = 8192 if y.shape[0] > 8192 else None
        if mesh is not None:
            from behavenet_tpu.parallel.seq import (
                sp_kalman_filter, sp_kalman_smooth)
            axis = mesh.axis_names[0]
            ms, Ps = sp_kalman_filter(
                F, c, Q, self._H, self.R, y, obs_mask, mu0, Sigma0, mesh,
                axis_name=axis, chunk=chunk)
            if smooth:
                ms, Ps = sp_kalman_smooth(F, c, Q, ms, Ps, mesh,
                                          axis_name=axis, chunk=chunk)
            return ms, Ps
        ms, Ps = kalman.filter_parallel(
            F, c, Q, self._H, self.R, y, obs_mask, mu0, Sigma0, chunk=chunk)
        if smooth:
            ms, Ps = kalman.smooth_parallel(F, c, Q, ms, Ps, chunk=chunk)
        return ms, Ps
