"""Long-horizon training parity check vs an equivalent torch model.

BASELINE.md target: reconstruction MSE within 1% of the PyTorch reference.
This script trains the same conv AE (identical init, identical batch
sequence, Adam(amsgrad) with the same hyperparameters) in behavenet_tpu and
in torch for N steps and reports the relative MSE gap over training.

Run on CPU:
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/parity_check.py
"""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), 'tests'))

import numpy as np
import torch

import jax
import jax.numpy as jnp
import optax

from behavenet_tpu.models import AE
from test_utils.test_torch_import import TorchRefAE, build_hparams
from behavenet_tpu.utils.torch_import import torch_state_dict_to_params


def main(n_steps=200, batch=32, lr=1e-3, report_every=25):
    hp = build_hparams(img=(1, 32, 24), n_latents=5)
    torch.manual_seed(0)
    ref = TorchRefAE(hp)

    model = AE(hp)
    params = model.init(jax.random.PRNGKey(0))
    params = torch_state_dict_to_params(ref.reference_state_dict(), model, params)

    tx = optax.amsgrad(lr)
    opt_state = tx.init(params)
    opt_t = torch.optim.Adam(ref.parameters(), lr=lr, amsgrad=True)

    @jax.jit
    def step(params, opt_state, batch_d):
        def lf(p):
            return model.loss_fn(p, batch_d, jax.random.PRNGKey(0))[0]
        loss, grads = jax.value_and_grad(lf)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    rs = np.random.RandomState(0)
    # structured frames (moving blob) so the AE actually learns something
    yy, xx = np.mgrid[:32, :24]

    def make_batch():
        pos = rs.rand(batch, 2) * [28, 20] + 2
        ims = np.exp(-((yy[None] - pos[:, 0, None, None]) ** 2
                       + (xx[None] - pos[:, 1, None, None]) ** 2) / 12.0)
        return ims[..., None].astype(np.float32)

    max_rel_gap = 0.0
    gaps = []
    for i in range(1, n_steps + 1):
        x = make_batch()
        params, opt_state, loss = step(params, opt_state, {'images': jnp.asarray(x)})
        opt_t.zero_grad()
        xt = torch.tensor(np.transpose(x, (0, 3, 1, 2)))
        y_t, _ = ref(xt)
        loss_t = torch.mean((y_t - xt) ** 2)
        loss_t.backward()
        opt_t.step()
        lj, lt = float(loss), float(loss_t)
        rel = abs(lj - lt) / max(lt, 1e-12)
        gaps.append(rel)
        max_rel_gap = max(max_rel_gap, rel)
        if i % report_every == 0 or i == 1:
            print('step %4d: jax mse %.6f | torch mse %.6f | rel gap %.4f%%' % (
                i, lj, lt, rel * 100))

    converged_gap = float(np.mean(gaps[-n_steps // 4:]))
    print('\nmax relative MSE gap over %d steps: %.4f%% '
          '(single-step transients included)' % (n_steps, max_rel_gap * 100))
    print('converged-regime mean relative MSE gap: %.4f%% (target: < 1%%)'
          % (converged_gap * 100))
    return converged_gap


if __name__ == '__main__':
    gap = main()
    if '--json' in sys.argv:
        # machine-readable line for bench.py (last line of stdout)
        import json
        print(json.dumps({'converged_rel_gap_pct': gap * 100}))
    sys.exit(0 if gap < 0.01 else 1)
