"""Direct unit tests for the neural decoders: loss vectors, lag windows, LSTM.

Covers what the reference never tested (its tests/README.md admits "modeling
code ... has not" been unit tested): MLP lag-trim rescaling arithmetic
(reference decoders.py:97-131), the four noise-dist loss paths, the
data-dependent precision head (:228-232,313-317), the temporal conv's
receptive-field contract (:187-193), and the working LSTM (the reference's
is a stub, :329-353).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from behavenet_tpu.models import Decoder
from behavenet_tpu.models.decoders import LSTM, MLP


def make_hp(noise_dist='gaussian', model_type='mlp', n_lags=2, n_max_lags=4,
            n_hid_layers=1, input_size=8, output_size=3, **kw):
    hp = {'model_class': 'neural-ae', 'model_type': model_type,
          'input_size': input_size, 'output_size': output_size,
          'n_hid_layers': n_hid_layers, 'n_hid_units': 10, 'n_lags': n_lags,
          'n_max_lags': n_max_lags, 'noise_dist': noise_dist,
          'activation': 'relu'}
    hp.update(kw)
    return hp


def _batch(hp, T=30, seed=0, int_targets=False):
    rs = np.random.RandomState(seed)
    preds = rs.randn(T, hp['input_size']).astype(np.float32)
    if int_targets:
        tgts = rs.randint(0, hp['output_size'], T).astype(np.int32)
    elif hp['noise_dist'] == 'poisson':
        tgts = rs.poisson(2.0, (T, hp['output_size'])).astype(np.float32)
    else:
        tgts = rs.randn(T, hp['output_size']).astype(np.float32)
    return {'predictors': jnp.asarray(preds), 'targets': jnp.asarray(tgts)}


class TestMLPLossVectors:
    """loss_fn values recomputed by hand from the model's own forward."""

    def test_gaussian_lag_trim_rescaling(self):
        hp = make_hp('gaussian', n_max_lags=4)
        model = Decoder(hp)
        params = model.init(jax.random.PRNGKey(0))
        batch = _batch(hp, T=30)
        loss, m = model.loss_fn(params, batch, jax.random.PRNGKey(1))

        out, _ = model.forward(params, batch['predictors'])
        out = np.asarray(out)[4:26]
        tgt = np.asarray(batch['targets'])[4:26]
        # reference arithmetic: window MSE weighted by (T - 2*max_lags)/T
        want = np.mean((out - tgt) ** 2) * (30 - 8) / 30
        assert np.allclose(float(loss), want, rtol=1e-5)
        # r2 on the same window (variance-weighted multioutput)
        from sklearn.metrics import r2_score
        want_r2 = r2_score(tgt, out, multioutput='variance_weighted')
        assert np.allclose(float(m['r2']), want_r2, rtol=1e-4)

    def test_poisson_loss_vector(self):
        hp = make_hp('poisson', n_max_lags=3)
        model = Decoder(hp)
        params = model.init(jax.random.PRNGKey(0))
        batch = _batch(hp, T=25)
        loss, _ = model.loss_fn(params, batch, jax.random.PRNGKey(1))

        out, _ = model.forward(params, batch['predictors'])
        out = np.asarray(out)[3:22]
        assert (out >= 0).all(), 'poisson rates must pass through softplus'
        tgt = np.asarray(batch['targets'])[3:22]
        # torch PoissonNLLLoss(log_input=False): rate - target*log(rate+eps)
        want = np.mean(out - tgt * np.log(out + 1e-8)) * (25 - 6) / 25
        assert np.allclose(float(loss), want, rtol=1e-5)

    def test_categorical_loss_and_fc(self):
        hp = make_hp('categorical', n_max_lags=2, output_size=4)
        model = Decoder(hp)
        params = model.init(jax.random.PRNGKey(0))
        batch = _batch(hp, T=20, int_targets=True)
        loss, m = model.loss_fn(params, batch, jax.random.PRNGKey(1))

        logits, _ = model.forward(params, batch['predictors'])
        logits = np.asarray(logits)[2:18]
        tgt = np.asarray(batch['targets'])[2:18]
        logp = logits - np.log(np.exp(logits - logits.max(1, keepdims=True)).sum(
            1, keepdims=True)) - logits.max(1, keepdims=True)
        want = np.mean(-logp[np.arange(len(tgt)), tgt]) * (20 - 4) / 20
        assert np.allclose(float(loss), want, rtol=1e-5)
        want_fc = np.mean(np.argmax(logits, axis=1) == tgt)
        assert np.allclose(float(m['fc']), want_fc)

    def test_gaussian_full_precision_head(self):
        hp = make_hp('gaussian-full', n_max_lags=2)
        model = Decoder(hp)
        params = model.init(jax.random.PRNGKey(0))
        batch = _batch(hp, T=20)
        out, prec = model.forward(params, batch['predictors'])
        prec = np.asarray(prec)
        assert prec.shape == (20, 3, 3)
        # y = L L^T is PSD and symmetric by construction
        assert np.allclose(prec, np.swapaxes(prec, 1, 2), atol=1e-5)
        assert (np.linalg.eigvalsh(prec) > -1e-5).all()
        loss, m = model.loss_fn(params, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(loss))

        # hand MVN NLL with covariance = 1e-3 I + precision-head output
        d = np.asarray(batch['targets'])[2:18] - np.asarray(out)[2:18]
        sig = 1e-3 * np.eye(3) + prec[2:18]
        nll = []
        for i in range(len(d)):
            sign, logdet = np.linalg.slogdet(sig[i])
            nll.append(0.5 * (3 * np.log(2 * np.pi) + logdet
                              + d[i] @ np.linalg.solve(sig[i], d[i])))
        want = np.mean(nll) * (20 - 4) / 20
        assert np.allclose(float(loss), want, rtol=1e-4)

    def test_gaussian_full_no_hidden_layers(self):
        hp = make_hp('gaussian-full', n_hid_layers=0, n_max_lags=2)
        model = Decoder(hp)
        params = model.init(jax.random.PRNGKey(0))
        loss, _ = model.loss_fn(params, _batch(hp, T=20), jax.random.PRNGKey(1))
        assert np.isfinite(float(loss))

    def test_conv_receptive_field_is_pm_n_lags(self):
        """Output at time t must see exactly inputs [t-n_lags, t+n_lags]."""
        hp = make_hp('gaussian', n_lags=2, n_hid_layers=0)
        mlp = MLP(hp)
        params = mlp.init(jax.random.PRNGKey(0))
        x = jnp.asarray(np.random.RandomState(0).randn(15, 8), dtype=jnp.float32)
        base_out, _ = mlp.apply(params, x)
        t = 7
        for dt, should_change in ((3, False), (-3, False), (2, True), (-2, True), (0, True)):
            x2 = np.asarray(x).copy()
            x2[t + dt] += 1.0
            out2, _ = mlp.apply(params, jnp.asarray(x2))
            changed = not np.allclose(np.asarray(base_out)[t], np.asarray(out2)[t])
            assert changed == should_change, 'dt=%d' % dt

    def test_invalid_noise_dist_and_type(self):
        with pytest.raises(ValueError):
            Decoder(make_hp('bogus'))
        with pytest.raises(ValueError):
            Decoder(make_hp(model_type='bogus'))


class TestLSTMDecoder:

    def test_shapes_and_finite(self):
        for bidir in (True, False):
            hp = make_hp('gaussian', model_type='lstm', bidirectional=bidir)
            model = Decoder(hp)
            params = model.init(jax.random.PRNGKey(0))
            out, prec = model.forward(params, _batch(hp, T=12)['predictors'])
            assert out.shape == (12, 3)
            assert prec is None
            assert np.isfinite(np.asarray(out)).all()

    def test_bidirectional_sees_future(self):
        """Future perturbations affect output iff bidirectional."""
        x = jnp.asarray(np.random.RandomState(0).randn(12, 8), dtype=jnp.float32)
        x2 = np.asarray(x).copy()
        x2[10] += 1.0  # future of t=3
        for bidir, should_change in ((True, True), (False, False)):
            hp = make_hp('gaussian', model_type='lstm', bidirectional=bidir)
            lstm = LSTM(hp)
            params = lstm.init(jax.random.PRNGKey(0))
            a, _ = lstm.apply(params, x)
            b, _ = lstm.apply(params, jnp.asarray(x2))
            changed = not np.allclose(np.asarray(a)[3], np.asarray(b)[3], atol=1e-7)
            assert changed == should_change, 'bidirectional=%s' % bidir

    def test_lstm_overfits_linear_map(self):
        """Training must drive the loss down on a learnable deterministic map."""
        from behavenet_tpu.fitting.training import make_train_functions
        hp = make_hp('gaussian', model_type='lstm', n_hid_units=16,
                     bidirectional=True, learning_rate=5e-3, n_max_lags=1)
        model = Decoder(hp)
        rs = np.random.RandomState(0)
        Wtrue = rs.randn(8, 3).astype(np.float32)
        preds = rs.randn(50, 8).astype(np.float32)
        batch = {'predictors': jnp.asarray(preds),
                 'targets': jnp.asarray(preds @ Wtrue)}
        tx, train_step, _ = make_train_functions(model, hp)
        params = model.init(jax.random.PRNGKey(0))
        opt_state = tx.init(params)
        losses_tr = []
        for i in range(150):
            params, opt_state, m = train_step(
                params, opt_state, jax.random.PRNGKey(i), dict(batch), {}, 0, None)
            losses_tr.append(float(m['loss']))
        assert losses_tr[-1] < 0.1 * losses_tr[0], \
            'LSTM failed to learn: %f -> %f' % (losses_tr[0], losses_tr[-1])

    def test_lstm_poisson_and_precision_heads(self):
        hp = make_hp('poisson', model_type='lstm')
        model = Decoder(hp)
        params = model.init(jax.random.PRNGKey(0))
        out, _ = model.forward(params, _batch(hp, T=10)['predictors'])
        assert (np.asarray(out) >= 0).all()

        hp = make_hp('gaussian-full', model_type='lstm')
        lstm = LSTM(hp)
        params = lstm.init(jax.random.PRNGKey(0))
        x = jnp.asarray(np.random.RandomState(0).randn(10, 8), dtype=jnp.float32)
        out, prec = lstm.apply(params, x)
        assert prec.shape == (10, 3, 3)
        assert (np.linalg.eigvalsh(np.asarray(prec)) > -1e-5).all()
