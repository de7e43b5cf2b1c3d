"""(AR)HMM segmentation engine: vectorized likelihoods + EM in pure JAX.

This replaces the external ``ssm`` package the reference delegates to
(behavenet/fitting/arhmm_grid_search.py:132-137). Supported configurations
mirror the reference's noise_type x lags mapping (:84-105):

==================  ====================================================
obs type            model
==================  ====================================================
'gaussian'          x_t | z=k ~ N(mu_k, Sigma_k)                (lags=0)
'ar'                x_t | z=k ~ N(sum_l A_kl x_{t-l} + b_k, Sigma_k)
'diagonal_*'        diagonal covariance variants
'studentst'/        Student's t emission / AR noise (scale-mixture EM)
'robust_ar'
==================  ====================================================

Transitions: 'stationary', 'sticky' (kappa), 'recurrent',
'recurrent_only' (:115-128).

TPU-native design: trials are padded to a common length with masks; the
E-step is :mod:`behavenet_tpu.ops.hmm` forward-backward vmapped over the
trial axis; M-steps are closed-form batched least squares (MXU einsums) for
AR/Gaussian parameters and a short in-jit Adam loop for recurrent
transition parameters. One full EM iteration compiles to a single XLA
program.

Conventions matching ssm: the first ``lags`` frames of each trial are
scored under a fixed N(0, I) initial condition for every state (ssm's
mu_init/Sigmas_init are not learned), and the AR regression only uses rows
with a full lag history.
"""

import pickle

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.special import gammaln

from behavenet_tpu.ops import hmm as hmm_ops
from behavenet_tpu.ops import smallmat

__all__ = ['ARHMM']

LN2PI = float(np.log(2 * np.pi))


def _pad_datas(datas, dtype=np.float32):
    """List of (T_i, D) -> (stacked (N, Tmax, D), mask (N, Tmax))."""
    datas = [np.asarray(d, dtype=dtype) for d in datas]
    Tmax = max(d.shape[0] for d in datas)
    D = datas[0].shape[1]
    out = np.zeros((len(datas), Tmax, D), dtype=dtype)
    mask = np.zeros((len(datas), Tmax), dtype=dtype)
    for i, d in enumerate(datas):
        out[i, :d.shape[0]] = d
        mask[i, :d.shape[0]] = 1.0
    return jnp.asarray(out), jnp.asarray(mask)


def _make_lagged(x, lags):
    """(T, D) -> design rows (T, D*lags) of [x_{t-1}, ..., x_{t-lags}] (zero-padded)."""
    feats = [jnp.roll(x, l, axis=0) for l in range(1, lags + 1)]
    X = jnp.concatenate(feats, axis=1)
    # rows t < lags have wrapped history; they are masked out of the AR
    # regression and scored by the N(0, I) initial condition
    return X


class ARHMM:
    """(AR)HMM with EM fitting; API mirrors ssm.HMM where the reference uses it."""

    def __init__(self, K, D, lags=1, observations='ar', transitions='stationary',
                 kappa=0.0, nu=4.0, rng_seed=0, parallel_scan=False,
                 dtype='float32'):
        if observations not in ('ar', 'gaussian', 'diagonal_ar', 'diagonal_gaussian',
                                'robust_ar', 'studentst', 'diagonal_robust_ar',
                                'diagonal_studentst'):
            raise ValueError('"%s" is an invalid observation type' % observations)
        if transitions not in ('stationary', 'sticky', 'recurrent', 'recurrent_only'):
            raise ValueError('"%s" is an invalid transition type' % transitions)
        self.K = int(K)
        self.D = int(D)
        self.observations = observations
        self.transitions = transitions
        self.kappa = float(kappa)
        self.rng_seed = rng_seed
        # parallel-prefix message passing (associative_scan log-matmul on the
        # MXU): same results to f32 roundoff, ~7x faster at T=100k on TPU;
        # the sequential scan is faster for the usual short-trial regime
        self.parallel_scan = bool(parallel_scan)
        # f64 EM (CPU-oriented): for ssm-bit-parity studies where f32
        # posteriors/WLS round differently from the reference's numpy f64.
        # Requires x64 mode so jnp doesn't silently downcast.
        if dtype not in ('float32', 'float64'):
            raise ValueError('dtype must be "float32" or "float64"')
        if dtype == 'float64':
            import jax as _jax
            if not _jax.config.jax_enable_x64:
                raise RuntimeError(
                    'ARHMM(dtype="float64") needs x64 mode: set JAX_ENABLE_X64=1 '
                    'or jax.config.update("jax_enable_x64", True) before any '
                    'computation (intended for CPU parity studies).')
        self.dtype = dtype
        self.np_dtype = np.float64 if dtype == 'float64' else np.float32
        self.autoregressive = 'ar' in observations.split('_') or observations.endswith('ar')
        self.lags = int(lags) if self.autoregressive else 0
        self.diagonal = observations.startswith('diagonal')
        self.robust = 'robust' in observations or 'studentst' in observations

        P = self.D * self.lags
        rng = np.random.RandomState(rng_seed)
        Ps = 0.95 * np.eye(K) + 0.05 * rng.rand(K, K)
        Ps /= Ps.sum(axis=1, keepdims=True)
        self.params = {
            'log_pi0': jnp.asarray(np.log(np.ones(K) / K), dtype=self.np_dtype),
            'log_Ps': jnp.asarray(np.log(Ps), dtype=self.np_dtype),
            # AR weights [A_1 ... A_lags] (K, D, D*lags) and bias (K, D)
            'As': jnp.asarray(
                0.8 * np.tile(np.eye(self.D), (K, 1, self.lags))
                if self.lags > 0 else np.zeros((K, self.D, max(P, 1))), dtype=self.np_dtype),
            'bs': jnp.asarray(0.01 * rng.randn(K, self.D), dtype=self.np_dtype),
            'Sigmas': jnp.asarray(np.tile(np.eye(self.D), (K, 1, 1)), dtype=self.np_dtype),
            'nus': jnp.full((K,), float(nu), dtype=self.np_dtype),
        }
        if transitions in ('recurrent', 'recurrent_only'):
            self.params['Rs'] = jnp.asarray(0.01 * rng.randn(K, self.D), dtype=self.np_dtype)
            self.params['r'] = jnp.zeros((K,), dtype=self.np_dtype)

        self._fit_step = None  # compiled EM step cache
        self._fit_step_sp = None  # compiled sequence-parallel EM step cache
        self._fit_scan = None  # compiled k-iterations-per-dispatch cache

    # ---------------------------------------------------- convenience views
    @property
    def transition_matrix(self):
        """Normalized (K, K) transition matrix (ssm-style accessor)."""
        import jax
        return np.asarray(jax.nn.softmax(self.params['log_Ps'], axis=1))

    @property
    def As(self):
        return np.asarray(self.params['As'])

    @property
    def bs(self):
        return np.asarray(self.params['bs'])

    @property
    def Sigmas(self):
        return np.asarray(self.params['Sigmas'])

    # ------------------------------------------------------------------ io
    def __getstate__(self):
        state = dict(self.__dict__)
        state['params'] = {k: np.asarray(v) for k, v in self.params.items()}
        state['_fit_step'] = None
        state['_fit_step_sp'] = None
        state['_fit_scan'] = None
        return state

    def __setstate__(self, state):
        self.__dict__.update(state)
        self.__dict__.setdefault('parallel_scan', False)  # pre-flag pickles
        self.__dict__.setdefault('_fit_step_sp', None)
        self.__dict__.setdefault('_fit_scan', None)
        self.__dict__.setdefault('dtype', 'float32')
        self.__dict__.setdefault('np_dtype', np.float32)
        if self.dtype == 'float64' and not jax.config.jax_enable_x64:
            # same guard as __init__: without it jnp.asarray silently
            # downcasts every param to f32 while self.dtype claims 'float64'
            raise RuntimeError(
                'loading an ARHMM fitted with dtype="float64" needs x64 mode: '
                'set JAX_ENABLE_X64=1 before starting the process.')
        self.params = {k: jnp.asarray(v) for k, v in self.params.items()}

    def save(self, filepath):
        with open(filepath, 'wb') as f:
            pickle.dump(self, f)

    @staticmethod
    def load(filepath):
        with open(filepath, 'rb') as f:
            return pickle.load(f)

    # ------------------------------------------------------ likelihood core
    def _log_likes(self, params, x, mask):
        """Per-frame observation log-likelihoods (T, K)."""
        T = x.shape[0]
        K, D, lags = self.K, self.D, self.lags
        if lags > 0:
            X = _make_lagged(x, lags)  # (T, D*lags)
            mus = jnp.einsum('kdp,tp->tkd', params['As'], X) + params['bs'][None]
        else:
            mus = jnp.broadcast_to(params['bs'][None], (T, K, D))
        diff = x[:, None, :] - mus  # (T, K, D)

        if self.diagonal:
            var = jnp.clip(jnp.diagonal(params['Sigmas'], axis1=1, axis2=2), 1e-8)  # (K, D)
            maha = jnp.sum(diff ** 2 / var[None], axis=2)
            logdet = jnp.sum(jnp.log(var), axis=1)  # (K,)
        else:
            chol = jnp.linalg.cholesky(
                params['Sigmas'] + 1e-8 * jnp.eye(D)[None])  # (K, D, D)
            Linv = jax.vmap(lambda c: jax.scipy.linalg.solve_triangular(
                c, jnp.eye(D), lower=True))(chol)  # (K, D, D)
            sol = jnp.einsum('kde,tke->tkd', Linv, diff)
            maha = jnp.sum(sol ** 2, axis=2)
            logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol, axis1=1, axis2=2)), axis=1)

        if self.robust:
            nus = jnp.clip(params['nus'], 1e-2)  # (K,)
            ll = (gammaln(0.5 * (nus + D)) - gammaln(0.5 * nus)
                  - 0.5 * D * jnp.log(nus * jnp.pi) - 0.5 * logdet)[None] \
                - 0.5 * (nus + D)[None] * jnp.log1p(maha / nus[None])
        else:
            ll = -0.5 * (D * LN2PI + logdet[None] + maha)

        if lags > 0:
            # first `lags` frames: fixed N(0, I) initial condition (all states)
            init_ll = -0.5 * (D * LN2PI + jnp.sum(x ** 2, axis=1))  # (T,)
            t_idx = jnp.arange(T)
            ll = jnp.where((t_idx < lags)[:, None], init_ll[:, None], ll)
        return ll * mask[:, None]

    def _log_P(self, params, x, mask):
        """Transition log-probs: (K,K) stationary or (T-1,K,K) recurrent."""
        if self.transitions in ('stationary', 'sticky'):
            return jax.nn.log_softmax(params['log_Ps'], axis=1)
        # input-driven: logits at step t->t+1 depend on x_t
        drive = jnp.einsum('kd,td->tk', params['Rs'], x[:-1])  # (T-1, K)
        if self.transitions == 'recurrent':
            logits = params['log_Ps'][None] + drive[:, None, :]
        else:  # recurrent_only: no base matrix
            logits = jnp.broadcast_to(
                (drive + params['r'][None])[:, None, :],
                (x.shape[0] - 1, self.K, self.K))
        return jax.nn.log_softmax(logits, axis=2)

    # ------------------------------------------------------------- public api
    def log_likelihood(self, datas):
        """Total log-likelihood of a trial or list of trials (ssm.HMM API)."""
        if not isinstance(datas, (list, tuple)):
            datas = [datas]
        x, mask = _pad_datas(datas, self.np_dtype)
        return float(self._batch_ll(self.params, x, mask))

    def _batch_ll(self, params, x, mask):
        def one(xi, mi):
            ll = self._log_likes(params, xi, mi)
            lp = self._log_P(params, xi, mi)
            fwd = hmm_ops.forward_parallel if self.parallel_scan else hmm_ops.forward
            _, log_Z = fwd(params['log_pi0'], lp, ll, mi)
            return log_Z
        return jnp.sum(jax.vmap(one)(x, mask))

    def most_likely_states(self, data, mesh=None):
        """Viterbi path for one trial (T,) (ssm.HMM API).

        With ``mesh`` (a ``jax.sharding.Mesh`` with an ``'sp'`` axis) the
        (max, +) scans run sequence-parallel across the mesh's chips
        (``parallel.seq.sp_viterbi``) — for single very long sessions.
        """
        x = jnp.asarray(np.asarray(data, dtype=self.np_dtype))
        mask = jnp.ones(x.shape[0], dtype=self.np_dtype)
        ll = self._log_likes(self.params, x, mask)
        lp = self._log_P(self.params, x, mask)
        if mesh is not None:
            from behavenet_tpu.parallel.seq import sp_viterbi
            return np.asarray(
                sp_viterbi(self.params['log_pi0'], lp, ll, mask, mesh=mesh,
                           axis_name=mesh.axis_names[0]))
        vit = hmm_ops.viterbi_parallel if self.parallel_scan else hmm_ops.viterbi
        return np.asarray(vit(self.params['log_pi0'], lp, ll, mask))

    def expected_states(self, data, mesh=None):
        """Posterior marginals gamma (T, K) for one trial.

        ``mesh`` shards the message passes over the time axis
        (``parallel.seq.sp_forward_backward``).
        """
        x = jnp.asarray(np.asarray(data, dtype=self.np_dtype))
        mask = jnp.ones(x.shape[0], dtype=self.np_dtype)
        ll = self._log_likes(self.params, x, mask)
        lp = self._log_P(self.params, x, mask)
        if mesh is not None:
            from behavenet_tpu.parallel.seq import sp_forward_backward
            gamma, _, _ = sp_forward_backward(
                self.params['log_pi0'], lp, ll, mask, mesh=mesh,
                axis_name=mesh.axis_names[0])
            return np.asarray(gamma)
        gamma, _, _ = hmm_ops.forward_backward(
            self.params['log_pi0'], lp, ll, mask, parallel=self.parallel_scan)
        return np.asarray(gamma)

    def posterior_sample(self, data, key=None, mesh=None):
        """Draw a state path z ~ p(z | data) for one trial (T,) int32.

        Forward-filter backward-sample with the backward pass realized as
        presampled predecessor maps composed by the pointer-doubling
        suffix scan (``ops.hmm.sample_posterior``) — with
        ``parallel_scan`` (or ``mesh``) the whole draw is parallel-depth
        on device, where the reference's ssm samples sequentially on the
        host. ``mesh`` shards the time axis
        (``parallel.seq.sp_sample_posterior``).
        """
        if key is None:
            key = jax.random.PRNGKey(np.random.randint(0, 2 ** 31 - 1))
        x = jnp.asarray(np.asarray(data, dtype=self.np_dtype))
        mask = jnp.ones(x.shape[0], dtype=self.np_dtype)
        ll = self._log_likes(self.params, x, mask)
        lp = self._log_P(self.params, x, mask)
        if mesh is not None:
            from behavenet_tpu.parallel.seq import sp_sample_posterior
            return np.asarray(sp_sample_posterior(
                key, self.params['log_pi0'], lp, ll, mask, mesh=mesh,
                axis_name=mesh.axis_names[0]))
        return np.asarray(hmm_ops.sample_posterior(
            key, self.params['log_pi0'], lp, ll, mask,
            parallel=self.parallel_scan))

    def permute(self, perm):
        """Relabel states by ``perm`` (ssm.HMM API; usage-sorting in the CLI)."""
        perm = np.asarray(perm)
        p = self.params
        new = dict(p)
        new['log_pi0'] = p['log_pi0'][perm]
        new['log_Ps'] = p['log_Ps'][np.ix_(perm, perm)]
        for key in ('As', 'bs', 'Sigmas', 'nus'):
            new[key] = p[key][perm]
        if 'Rs' in p:
            new['Rs'] = p['Rs'][perm]
            new['r'] = p['r'][perm]
        self.params = new

    def sample(self, T, key=None, prefix=None, with_noise=True):
        """Sample (states, observations) of length T from the generative model.

        For recurrent transitions z_{t+1} depends on x_t, so states and
        observations are sampled interleaved; stationary/sticky models sample
        the state chain first (one pass) and then the observations.
        """
        if key is None:
            key = jax.random.PRNGKey(np.random.randint(0, 2 ** 31 - 1))
        k_z, k_x = jax.random.split(key)
        if self.transitions not in ('recurrent', 'recurrent_only'):
            lp = jax.nn.log_softmax(self.params['log_Ps'], axis=1)
            zs = hmm_ops.sample_states(k_z, self.params['log_pi0'], lp, T)
            xs = self.sample_x(zs, key=k_x, prefix=prefix, with_noise=with_noise)
            return np.asarray(zs), xs

        K, D = self.K, self.D
        rs = np.random.RandomState(int(jax.random.randint(k_z, (), 0, 2 ** 31 - 1)))
        pi0 = np.asarray(jax.nn.softmax(self.params['log_pi0']))
        log_Ps = np.asarray(self.params['log_Ps'])
        Rs = np.asarray(self.params['Rs'])
        r = np.asarray(self.params['r'])
        chols = np.linalg.cholesky(np.asarray(self.params['Sigmas']) + 1e-8 * np.eye(D))
        noise = np.asarray(jax.random.normal(k_x, (T, D)))
        hist = [] if prefix is None else [np.asarray(p) for p in prefix]
        zs = np.zeros(T, dtype=np.int32)
        xs = np.zeros((T, D), dtype=self.np_dtype)
        for t in range(T):
            if t == 0:
                zs[0] = rs.choice(K, p=pi0)
            else:
                drive = Rs @ xs[t - 1]  # (K,)
                if self.transitions == 'recurrent':
                    logits = log_Ps[zs[t - 1]] + drive
                else:  # recurrent_only: logits independent of previous state
                    logits = drive + r
                p = np.exp(logits - logits.max())
                zs[t] = rs.choice(K, p=p / p.sum())
            mu = self._ar_mean(int(zs[t]), t, xs, hist)
            xs[t] = mu + (chols[zs[t]] @ noise[t] if with_noise else 0.0)
        return zs, xs

    def _ar_mean(self, k, t, xs, hist):
        """Conditional mean of x_t given state k and the sample history."""
        D, lags = self.D, self.lags
        bs = np.asarray(self.params['bs'])
        if lags == 0:
            return bs[k]
        As = np.asarray(self.params['As'])
        mu = bs[k].copy()
        for l in range(1, lags + 1):
            if t - l >= 0:
                x_lag = xs[t - l]
            elif len(hist) >= l - t:
                x_lag = hist[-(l - t)]
            else:
                x_lag = np.zeros(D)
            mu += As[k][:, (l - 1) * D:l * D] @ x_lag
        return mu

    def sample_x(self, states, key=None, prefix=None, with_noise=True):
        """Sample observations conditioned on a state sequence (ssm-like sample_x)."""
        if key is None:
            key = jax.random.PRNGKey(np.random.randint(0, 2 ** 31 - 1))
        states = np.asarray(states)
        T = len(states)
        D = self.D
        chols = np.linalg.cholesky(np.asarray(self.params['Sigmas']) + 1e-8 * np.eye(D))
        noise = np.asarray(jax.random.normal(key, (T, D)))
        xs = np.zeros((T, D), dtype=self.np_dtype)
        hist = [] if prefix is None else [np.asarray(p) for p in prefix]
        for t in range(T):
            k = int(states[t])
            mu = self._ar_mean(k, t, xs, hist)
            xs[t] = mu + (chols[k] @ noise[t] if with_noise else 0.0)
        return xs

    # ------------------------------------------------------------------- EM
    def initialize(self, datas, localize=True):
        """ssm-style initialization: k-means clusters -> per-cluster (AR) fits."""
        from sklearn.cluster import KMeans
        stacked = np.vstack([np.asarray(d) for d in datas]).astype(np.float64)
        km = KMeans(self.K, n_init=10, random_state=self.rng_seed).fit(stacked)
        labels = km.labels_
        D, lags, K = self.D, self.lags, self.K

        bs = np.zeros((K, D))
        As = np.zeros((K, D, max(D * lags, 1)))
        Sigmas = np.tile(np.eye(D), (K, 1, 1))

        if lags == 0:
            for k in range(K):
                pts = stacked[labels == k]
                if len(pts) > 1:
                    bs[k] = pts.mean(axis=0)
                    Sigmas[k] = np.cov(pts.T) + 1e-4 * np.eye(D)
        else:
            # localize: fit AR params per k-means cluster (ssm localize=True)
            offset = 0
            Xs, Ys, Ls = [], [], []
            for d in datas:
                d = np.asarray(d)
                T = d.shape[0]
                if T <= lags:
                    offset += T
                    continue
                feats = np.concatenate(
                    [d[lags - l:T - l] for l in range(1, lags + 1)], axis=1)
                Xs.append(np.concatenate([feats, np.ones((T - lags, 1))], axis=1))
                Ys.append(d[lags:])
                Ls.append(labels[offset + lags:offset + T])
                offset += T
            X = np.vstack(Xs)
            Y = np.vstack(Ys)
            L = np.concatenate(Ls)
            for k in range(K):
                sel = (L == k) if localize else np.ones(len(L), dtype=bool)
                if sel.sum() < D * lags + 1:
                    sel = np.ones(len(L), dtype=bool)
                Xk, Yk = X[sel], Y[sel]
                beta = np.linalg.lstsq(
                    Xk.T @ Xk + 1e-4 * np.eye(Xk.shape[1]), Xk.T @ Yk, rcond=None)[0]
                As[k] = beta[:-1].T
                bs[k] = beta[-1]
                resid = Yk - Xk @ beta
                Sigmas[k] = (resid.T @ resid) / max(len(Yk), 1) + 1e-4 * np.eye(D)

        self.params = dict(self.params)
        self.params['As'] = jnp.asarray(As, dtype=self.np_dtype)
        self.params['bs'] = jnp.asarray(bs, dtype=self.np_dtype)
        self.params['Sigmas'] = jnp.asarray(Sigmas, dtype=self.np_dtype)

    def _em_step(self, params, x, mask):
        """One full EM iteration on padded trials (N, T, D); fully jittable."""
        K, D, lags = self.K, self.D, self.lags

        # ---- E-step
        def e_one(xi, mi):
            ll = self._log_likes(params, xi, mi)
            lp = self._log_P(params, xi, mi)
            gamma, log_Z, xi_sum = hmm_ops.forward_backward(
                params['log_pi0'], lp, ll, mi, parallel=self.parallel_scan)
            return gamma, log_Z, xi_sum

        gammas, log_Zs, xi_sums = jax.vmap(e_one)(x, mask)  # (N,T,K), (N,), (N,K,K)
        total_ll = jnp.sum(log_Zs)
        return self._m_step(params, x, mask, gammas, xi_sums), total_ll

    def _m_step(self, params, x, mask, gammas, xi_sums):
        """All M-step updates from posteriors; shared by the trial-sharded
        and the sequence-parallel E-steps. Returns the new params dict."""
        K, D, lags = self.K, self.D, self.lags
        new = dict(params)

        # ---- M-step: initial distribution
        pi0 = jnp.mean(gammas[:, 0, :], axis=0) + 1e-8
        new['log_pi0'] = jnp.log(pi0 / jnp.sum(pi0))

        # ---- M-step: transitions
        if self.transitions in ('stationary', 'sticky'):
            counts = jnp.sum(xi_sums, axis=0)  # (K, K)
            if self.transitions == 'sticky':
                counts = counts + self.kappa * jnp.eye(K)
            counts = counts + 1e-8
            new['log_Ps'] = jnp.log(counts / jnp.sum(counts, axis=1, keepdims=True))
        else:
            new = self._m_step_recurrent(new, params, x, mask)

        # ---- M-step: observations (weighted least squares / weighted means)
        w = gammas * mask[:, :, None]  # (N, T, K)
        if self.robust:
            # scale-mixture weights tau = E[precision scale | data]
            w = w * self._tau_weights(params, x, mask)
        if lags > 0:
            # exclude frames without a full lag history
            t_idx = jnp.arange(x.shape[1])
            w = w * (t_idx >= lags)[None, :, None]
            feats = jax.vmap(lambda xi: _make_lagged(xi, lags))(x)  # (N, T, D*lags)
            Xd = jnp.concatenate([feats, jnp.ones(x.shape[:2] + (1,))], axis=2)
        else:
            Xd = jnp.ones(x.shape[:2] + (1,))
        Pdim = Xd.shape[2]
        Xf = Xd.reshape(-1, Pdim)
        Yf = x.reshape(-1, D)
        Wf = w.reshape(-1, K)

        XtWX = jnp.einsum('np,nk,nq->kpq', Xf, Wf, Xf)  # (K, P, P)
        XtWY = jnp.einsum('np,nk,nd->kpd', Xf, Wf, Yf)  # (K, P, D)
        # Jacobi-equilibrated ridge solve: real AE latents mix a ones column
        # with tiny-variance dims and occasional large outliers, driving
        # cond(XtWX) past what f32 can solve (observed ~1e11). Rescaling to
        # correlation form bounds the condition number by the feature
        # correlations, and the ridge is then a clean relative 1e-5.
        s = 1.0 / jnp.sqrt(jnp.clip(
            jnp.diagonal(XtWX, axis1=1, axis2=2), 1e-8))  # (K, P)
        A = XtWX * s[:, :, None] * s[:, None, :] + 1e-5 * jnp.eye(Pdim)[None]
        # equilibrated + ridged -> SPD: pivot-free unrolled solve is safe
        beta = s[:, :, None] * smallmat.solve_small(A, XtWY * s[:, :, None])  # (K, P, D)
        if lags > 0:
            new['As'] = jnp.transpose(beta[:, :-1, :], (0, 2, 1))  # (K, D, D*lags)
        new['bs'] = beta[:, -1, :]

        resid = Yf[:, None, :] - jnp.einsum('np,kpd->nkd', Xf, beta)  # (N*, K, D)
        # covariance weights use gamma only (not tau-scaled denominators twice)
        wsum = jnp.sum(Wf, axis=0)  # (K,)
        if self.diagonal:
            var = jnp.einsum('nk,nkd->kd', Wf, resid ** 2) / \
                jnp.clip(wsum[:, None], 1e-8) + 1e-6
            new['Sigmas'] = jax.vmap(jnp.diag)(var)
        else:
            Sig = jnp.einsum('nk,nkd,nke->kde', Wf, resid, resid) / \
                jnp.clip(wsum[:, None, None], 1e-8)
            # symmetrize + scale-relative jitter so the next E-step's cholesky
            # stays PSD under f32 accumulation (sharded reductions reorder sums)
            Sig = 0.5 * (Sig + jnp.swapaxes(Sig, 1, 2))
            jit_eps = 1e-6 * (1.0 + jnp.max(
                jnp.diagonal(Sig, axis1=1, axis2=2), axis=1))  # (K,)
            new['Sigmas'] = Sig + jit_eps[:, None, None] * jnp.eye(D)[None]

        # ---- M-step: Student's-t degrees of freedom (scale-mixture EM)
        if self.robust:
            new['nus'] = self._m_step_nu(params, x, mask, gammas)

        return new

    def _em_step_sp(self, params, x, mask, mesh):
        """One EM iteration with every trial's *time axis* sharded over
        ``mesh`` (first axis). The E-step message passes run through the
        distributed scans of ``parallel.seq``; the M-step's sufficient
        statistics are contractions over (trial, time), which XLA lowers
        to ``psum`` over ICI on the time-sharded operands. For a handful
        of very long sessions (N small, T huge) — the transpose of the
        trial-sharded ``fit(mesh=...)`` layout."""
        from behavenet_tpu.parallel.seq import sp_forward_backward
        axis = mesh.axis_names[0]
        outs = [sp_forward_backward(
                    params['log_pi0'],
                    self._log_P(params, x[i], mask[i]),
                    self._log_likes(params, x[i], mask[i]),
                    mask[i], mesh=mesh, axis_name=axis)
                for i in range(x.shape[0])]
        gammas = jnp.stack([o[0] for o in outs])
        total_ll = sum(o[1] for o in outs)
        xi_sums = jnp.stack([o[2] for o in outs])
        return self._m_step(params, x, mask, gammas, xi_sums), total_ll

    def _m_step_nu(self, params, x, mask, gammas):
        """Newton update of per-state dof: solve the t-dist EM stationarity
        condition  log(nu/2) - digamma(nu/2) + 1 + E_w[log tau - tau] +
        digamma((nu+D)/2) - log((nu+D)/2) = 0.
        """
        from jax.scipy.special import digamma

        D = self.D
        taus = self._tau_weights(params, x, mask)        # (N, T, K)
        w = gammas * mask[:, :, None]
        wsum = jnp.clip(jnp.sum(w, axis=(0, 1)), 1e-8)   # (K,)
        # E[log tau] under the gamma posterior = digamma((nu+D)/2) - log((nu+maha)/2)
        # and tau itself is the posterior mean; both are summarized via taus:
        nus = jnp.clip(params['nus'], 1e-2)
        e_log_tau = digamma(0.5 * (nus + D))[None, None, :] + jnp.log(taus) \
            - jnp.log(0.5 * (nus + D))[None, None, :]
        # Q-maximization constant: 1 + E_w[E[log tau] - E[tau]] (e_log_tau is
        # already the full posterior expectation — no Liu-Rubin log-u correction)
        c = 1.0 + jnp.sum(w * (e_log_tau - taus), axis=(0, 1)) / wsum  # (K,)

        def newton(nu, _):
            half = 0.5 * nu
            f = jnp.log(half) - digamma(half) + c
            # d/dnu [log(nu/2) - digamma(nu/2)] = 1/nu - polygamma(1, nu/2)/2
            eps = 1e-3 * nu
            half2 = 0.5 * (nu + eps)
            f2 = jnp.log(half2) - digamma(half2) + c
            grad = (f2 - f) / eps
            nu_new = nu - f / jnp.where(jnp.abs(grad) > 1e-12, grad, -1e-12)
            return jnp.clip(nu_new, 1.0, 200.0), None

        nus_new, _ = jax.lax.scan(newton, nus, None, length=10)
        return nus_new

    def _tau_weights(self, params, x, mask):
        """E[tau] for Student's t scale-mixture EM: (N, T, K)."""
        K, D, lags = self.K, self.D, self.lags

        def one(xi):
            if lags > 0:
                X = _make_lagged(xi, lags)
                mus = jnp.einsum('kdp,tp->tkd', params['As'], X) + params['bs'][None]
            else:
                mus = jnp.broadcast_to(params['bs'][None], (xi.shape[0], K, D))
            diff = xi[:, None, :] - mus
            if self.diagonal:
                var = jnp.clip(jnp.diagonal(params['Sigmas'], axis1=1, axis2=2), 1e-8)
                maha = jnp.sum(diff ** 2 / var[None], axis=2)
            else:
                chol = jnp.linalg.cholesky(params['Sigmas'] + 1e-8 * jnp.eye(D)[None])
                Linv = jax.vmap(lambda c: jax.scipy.linalg.solve_triangular(
                    c, jnp.eye(D), lower=True))(chol)
                sol = jnp.einsum('kde,tke->tkd', Linv, diff)
                maha = jnp.sum(sol ** 2, axis=2)
            nus = jnp.clip(params['nus'], 1e-2)
            return (nus[None] + D) / (nus[None] + maha)

        return jax.vmap(one)(x)

    def _m_step_recurrent(self, new, params, x, mask):
        """Gradient M-step for input-driven transition parameters.

        The expected transitions (posteriors under the *old* params) are
        constant w.r.t. the optimized parameters, so the E-step message
        passing runs exactly once here — not once per gradient evaluation.
        """
        import optax

        def e_one(xi, mi):
            ll = self._log_likes(params, xi, mi)
            lp_old = self._log_P(params, xi, mi)
            return hmm_ops.expected_transitions(params['log_pi0'], lp_old, ll, mi)

        xis_all = jax.vmap(e_one)(x, mask)  # (N, T-1, K, K)

        def objective(trans_params):
            p = dict(params)
            p.update(trans_params)

            def one(xi, mi, xis):
                lp_new = self._log_P(p, xi, mi)
                lp_new = lp_new if lp_new.ndim == 3 else jnp.broadcast_to(
                    lp_new[None], xis.shape)
                return jnp.sum(xis * lp_new)

            return -jnp.sum(jax.vmap(one)(x, mask, xis_all))

        trans = {'log_Ps': params['log_Ps'], 'Rs': params['Rs'], 'r': params['r']}
        tx = optax.adam(1e-2)
        opt_state = tx.init(trans)

        def body(carry, _):
            trans, opt_state = carry
            grads = jax.grad(objective)(trans)
            updates, opt_state = tx.update(grads, opt_state, trans)
            trans = optax.apply_updates(trans, updates)
            return (trans, opt_state), None

        (trans, _), _ = jax.lax.scan(body, (trans, opt_state), None, length=25)
        new.update(trans)
        return new

    def fit(self, datas, method='em', num_iters=1, initialize=False, tolerance=0.0,
            mesh=None, shard_time=False, iters_per_dispatch=1):
        """Run EM iterations (ssm.HMM.fit API subset). Returns per-iter lls.

        ``iters_per_dispatch``: scan k EM iterations inside ONE jitted
        device program (``lax.scan`` over the iteration axis) instead of
        dispatching them one by one — same trick as the trainer's
        ``steps_per_dispatch``. Amortizes per-dispatch overhead (dominant
        on high-latency links); the per-iteration log-likelihood history
        is still returned. With ``tolerance > 0`` convergence is checked
        *between* dispatches, so a fit may run up to ``k - 1`` iterations
        past the stopping point (the returned lls show exactly where it
        converged); leftover ``num_iters % k`` iterations run single-step.

        ``mesh``: optional ``jax.sharding.Mesh`` — trials are sharded across
        its first axis (data-parallel EM). The E-step is independent per
        trial; the M-step's sufficient statistics are global sums over
        (trial, time), which XLA lowers to ``psum`` collectives over ICI.
        The trial count is padded to a mesh multiple with fully-masked
        trials, which are exactly inert in every update (zero posterior
        weight, zero transition counts, log_Z == 0).

        ``shard_time``: with ``mesh``, shard each trial's *time* axis
        instead of the trial axis (sequence-parallel EM via
        ``parallel.seq``) — for a handful of sessions too long for one
        chip. Stationary/sticky transitions only (the recurrent GLM
        M-step re-runs per-trial message passes that are not
        time-sharded).
        """
        if method != 'em':
            raise NotImplementedError('only EM fitting is supported')
        if not isinstance(datas, (list, tuple)):
            datas = [datas]
        if initialize:
            self.initialize(datas)
        x, mask = _pad_datas(datas, self.np_dtype)
        if shard_time and mesh is None:
            raise ValueError(
                'shard_time=True requires mesh= (a jax.sharding.Mesh to '
                'shard the time axis over); without one the run would '
                'silently be single-device')
        if mesh is not None and shard_time:
            if self.transitions not in ('stationary', 'sticky'):
                raise NotImplementedError(
                    'shard_time EM supports stationary/sticky transitions only')
            from jax.sharding import NamedSharding, PartitionSpec as P
            axis = mesh.axis_names[0]
            # pad T to a mesh multiple with masked frames (exactly inert:
            # zero posterior weight, identity chain elements, log_Z fixed)
            pad_t = (-x.shape[1]) % mesh.devices.size
            if pad_t:
                x = jnp.concatenate(
                    [x, jnp.zeros((x.shape[0], pad_t, x.shape[2]), x.dtype)],
                    axis=1)
                mask = jnp.concatenate(
                    [mask, jnp.zeros((mask.shape[0], pad_t), mask.dtype)],
                    axis=1)
            x = jax.device_put(x, NamedSharding(mesh, P(None, axis)))
            mask = jax.device_put(mask, NamedSharding(mesh, P(None, axis)))
            self.params = jax.device_put(self.params, NamedSharding(mesh, P()))
            # the compiled step closes over the mesh: cache per mesh, or a
            # second fit with a different mesh would silently reuse the first
            base_fn = lambda p, x_d, m_d: self._em_step_sp(p, x_d, m_d, mesh)  # noqa: E731
            if self._fit_step_sp is None or self._fit_step_sp[0] != mesh:
                self._fit_step_sp = (mesh, jax.jit(base_fn))
            step = self._fit_step_sp[1]
        elif mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            axis = mesh.axis_names[0]
            n_dev = mesh.devices.size
            pad_n = (-x.shape[0]) % n_dev
            if pad_n:
                x = jnp.concatenate([x, jnp.zeros((pad_n,) + x.shape[1:], x.dtype)])
                mask = jnp.concatenate(
                    [mask, jnp.zeros((pad_n,) + mask.shape[1:], mask.dtype)])
            x = jax.device_put(x, NamedSharding(mesh, P(axis)))
            mask = jax.device_put(mask, NamedSharding(mesh, P(axis)))
            self.params = jax.device_put(self.params, NamedSharding(mesh, P()))
            step = None
        else:
            step = None
        if step is None:  # trial-sharded and single-device share _em_step
            if self._fit_step is None:
                self._fit_step = jax.jit(self._em_step)
            step = self._fit_step
            base_fn = self._em_step
        k = max(1, int(iters_per_dispatch))
        scan_step = None
        if k > 1:
            cache_key = (mesh, bool(shard_time), k)
            if self._fit_scan is None or self._fit_scan[0] != cache_key:
                def _scan_k(p, x_d, m_d):
                    def body(p, _):
                        p, ll = base_fn(p, x_d, m_d)
                        return p, ll
                    return jax.lax.scan(body, p, None, length=k)
                self._fit_scan = (cache_key, jax.jit(_scan_k))
            scan_step = self._fit_scan[1]
        lls = []
        while len(lls) < num_iters:
            # relative-tolerance convergence stop (ssm HMM.fit semantics; the
            # same rule the CLI applies to val LL, arhmm_grid_search.py)
            if tolerance > 0 and len(lls) >= 2 and \
                    abs((lls[-1] - lls[-2]) / lls[-1]) < tolerance:
                break
            if scan_step is not None and num_iters - len(lls) >= k:
                self.params, ll_k = scan_step(self.params, x, mask)
                lls.extend(float(v) for v in np.asarray(ll_k))
            else:
                self.params, ll = step(self.params, x, mask)
                lls.append(float(ll))
        return lls
