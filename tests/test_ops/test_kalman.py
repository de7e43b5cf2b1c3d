"""Kalman ops: sequential vs naive-numpy oracle; parallel vs sequential."""

import numpy as np

import jax.numpy as jnp

from behavenet_tpu.ops import kalman


def make_system(T=60, n=3, d=2, seed=0, mask_frac=0.0, time_varying=True):
    rs = np.random.RandomState(seed)
    if time_varying:
        F = np.stack([np.eye(n) * 0.8 + 0.05 * rs.randn(n, n) for _ in range(T)])
    else:
        F = np.tile(np.eye(n) * 0.9, (T, 1, 1))
    c = 0.1 * rs.randn(T, n)
    Q = np.tile(0.05 * np.eye(n), (T, 1, 1))
    H = rs.randn(d, n)
    R = 0.1 * np.eye(d)
    m0 = rs.randn(n)
    P0 = np.eye(n)
    # simulate
    x = np.zeros((T, n))
    x_prev = m0
    for t in range(T):
        x[t] = F[t] @ x_prev + c[t] + rs.multivariate_normal(np.zeros(n), Q[t])
        x_prev = x[t]
    y = x @ H.T + rs.multivariate_normal(np.zeros(d), R, size=T)
    mask = np.ones(T, dtype=np.float32)
    if mask_frac > 0:
        drop = rs.rand(T) < mask_frac
        drop[0] = False
        mask[drop] = 0.0
    args = tuple(jnp.asarray(a, dtype=jnp.float32)
                 for a in (F, c, Q, H, R, y, mask, m0, P0))
    return args, x


def naive_filter(F, c, Q, H, R, y, mask, m0, P0):
    """Textbook numpy Kalman filter (f64)."""
    T, n = c.shape
    ms, Ps = np.zeros((T, n)), np.zeros((T, n, n))
    m, P = np.asarray(m0, float), np.asarray(P0, float)
    for t in range(T):
        m = F[t] @ m + c[t]
        P = F[t] @ P @ F[t].T + Q[t]
        if mask[t] > 0:
            S = H @ P @ H.T + R
            K = P @ H.T @ np.linalg.inv(S)
            m = m + K @ (y[t] - H @ m)
            P = P - K @ H @ P
        ms[t], Ps[t] = m, P
    return ms, Ps


def naive_smooth(F, c, Q, ms, Ps):
    T, n = ms.shape
    ms_s, Ps_s = ms.copy(), Ps.copy()
    for t in range(T - 2, -1, -1):
        m_p = F[t + 1] @ ms[t] + c[t + 1]
        P_p = F[t + 1] @ Ps[t] @ F[t + 1].T + Q[t + 1]
        G = Ps[t] @ F[t + 1].T @ np.linalg.inv(P_p)
        ms_s[t] = ms[t] + G @ (ms_s[t + 1] - m_p)
        Ps_s[t] = Ps[t] + G @ (Ps_s[t + 1] - P_p) @ G.T
    return ms_s, Ps_s


def _np(args):
    return tuple(np.asarray(a, dtype=np.float64) for a in args)


class TestFilter:

    def test_sequential_matches_naive(self):
        args, _ = make_system()
        ms, Ps, _, _ = kalman.filter_sequential(*args)
        ms_n, Ps_n = naive_filter(*_np(args))
        assert np.allclose(np.asarray(ms), ms_n, atol=1e-3)
        assert np.allclose(np.asarray(Ps), Ps_n, atol=1e-3)

    def test_sequential_matches_naive_with_mask(self):
        args, _ = make_system(mask_frac=0.3, seed=2)
        ms, Ps, _, _ = kalman.filter_sequential(*args)
        ms_n, Ps_n = naive_filter(*_np(args))
        assert np.allclose(np.asarray(ms), ms_n, atol=1e-3)

    def test_parallel_matches_sequential(self):
        for seed, mask_frac in ((0, 0.0), (1, 0.25)):
            args, _ = make_system(seed=seed, mask_frac=mask_frac)
            ms_s, Ps_s, _, _ = kalman.filter_sequential(*args)
            ms_p, Ps_p = kalman.filter_parallel(*args)
            assert np.allclose(np.asarray(ms_s), np.asarray(ms_p), atol=2e-3), \
                np.abs(np.asarray(ms_s) - np.asarray(ms_p)).max()
            assert np.allclose(np.asarray(Ps_s), np.asarray(Ps_p), atol=2e-3)

    def test_filter_tracks_truth(self):
        args, x = make_system(T=200, seed=3)
        ms, _, _, _ = kalman.filter_sequential(*args)
        err_filter = np.mean((np.asarray(ms) - x) ** 2)
        err_prior = np.mean(x ** 2)
        assert err_filter < 0.5 * err_prior


class TestSmoother:

    def test_sequential_matches_naive(self):
        args, _ = make_system()
        F, c, Q = args[0], args[1], args[2]
        ms, Ps, m_pred, P_pred = kalman.filter_sequential(*args)
        ms_s, Ps_s = kalman.smooth_sequential(F, c, Q, ms, Ps, m_pred, P_pred)
        np_args = _np(args)
        ms_n, Ps_n = naive_filter(*np_args)
        ms_sn, Ps_sn = naive_smooth(np_args[0], np_args[1], np_args[2], ms_n, Ps_n)
        assert np.allclose(np.asarray(ms_s), ms_sn, atol=2e-3)
        assert np.allclose(np.asarray(Ps_s), Ps_sn, atol=2e-3)

    def test_parallel_matches_sequential(self):
        args, _ = make_system(seed=4)
        F, c, Q = args[0], args[1], args[2]
        ms, Ps, m_pred, P_pred = kalman.filter_sequential(*args)
        ms_s, Ps_s = kalman.smooth_sequential(F, c, Q, ms, Ps, m_pred, P_pred)
        ms_p, Ps_p = kalman.smooth_parallel(F, c, Q, ms, Ps)
        assert np.allclose(np.asarray(ms_s), np.asarray(ms_p), atol=2e-3), \
            np.abs(np.asarray(ms_s) - np.asarray(ms_p)).max()
        assert np.allclose(np.asarray(Ps_s), np.asarray(Ps_p), atol=2e-3)

    def test_smoother_beats_filter(self):
        args, x = make_system(T=200, seed=5)
        F, c, Q = args[0], args[1], args[2]
        ms, Ps, m_pred, P_pred = kalman.filter_sequential(*args)
        ms_s, _ = kalman.smooth_sequential(F, c, Q, ms, Ps, m_pred, P_pred)
        err_f = np.mean((np.asarray(ms) - x) ** 2)
        err_s = np.mean((np.asarray(ms_s) - x) ** 2)
        assert err_s < err_f


class TestChunkedScans:
    """Chunked two-level scans == single associative scan (compile-time fix)."""

    def test_chunked_filter_matches_unchunked(self):
        args, _ = make_system(T=333, mask_frac=0.2, seed=3)
        ms0, Ps0 = kalman.filter_parallel(*args)
        for chunk in (64, 100, 512):  # non-divisible + chunk > T cases
            ms1, Ps1 = kalman.filter_parallel(*args, chunk=chunk)
            assert np.allclose(np.asarray(ms0), np.asarray(ms1), atol=1e-4)
            assert np.allclose(np.asarray(Ps0), np.asarray(Ps1), atol=1e-4)

    def test_chunked_smoother_matches_unchunked(self):
        args, _ = make_system(T=257, mask_frac=0.1, seed=4)
        F, c, Q = args[0], args[1], args[2]
        ms, Ps = kalman.filter_parallel(*args)
        ms0, Ps0 = kalman.smooth_parallel(F, c, Q, ms, Ps)
        for chunk in (64, 129):
            ms1, Ps1 = kalman.smooth_parallel(F, c, Q, ms, Ps, chunk=chunk)
            assert np.allclose(np.asarray(ms0), np.asarray(ms1), atol=1e-4)
            assert np.allclose(np.asarray(Ps0), np.asarray(Ps1), atol=1e-4)

    def test_chunked_filter_matches_sequential_oracle(self):
        args, _ = make_system(T=200, mask_frac=0.3, seed=5)
        ref_m, ref_P = naive_filter(*_np(args))
        ms, Ps = kalman.filter_parallel(*args, chunk=32)
        assert np.allclose(np.asarray(ms), ref_m, atol=1e-3)
        assert np.allclose(np.asarray(Ps), ref_P, atol=1e-3)
