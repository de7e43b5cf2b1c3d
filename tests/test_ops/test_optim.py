"""torch-exact AMSGrad: lockstep equivalence with torch.optim.Adam(amsgrad=True).

The reference trains everything with Adam(amsgrad=True) (reference
fitting/training.py:284-286). optax.amsgrad maxes the bias-corrected
second moment, torch maxes the raw moment — they disagree whenever an
early gradient spike sets the max, so the framework ships its own
torch-exact recursion (ops/optim.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import torch

from behavenet_tpu.ops import optim


def _run_lockstep(gs, lr=1e-3):
    p0 = np.linspace(-1, 1, gs[0].size).astype(np.float32)
    pt = torch.nn.Parameter(torch.tensor(p0.copy()))
    opt_t = torch.optim.Adam([pt], lr=lr, amsgrad=True)
    for g in gs:
        opt_t.zero_grad()
        pt.grad = torch.tensor(g)
        opt_t.step()

    tx = optim.amsgrad(lr)
    pj = jnp.asarray(p0.copy())
    st = tx.init(pj)
    for g in gs:
        u, st = tx.update(jnp.asarray(g), st, pj)
        pj = optax.apply_updates(pj, u)
    return np.asarray(pj), pt.detach().numpy()


class TestAmsgradTorchExact:

    def test_matches_torch_with_early_spike(self):
        """An early gradient spike sets nu_max: the case optax.amsgrad gets wrong."""
        rs = np.random.RandomState(0)
        gs = [rs.randn(16).astype(np.float32) * (10.0 if i == 3 else 1.0)
              for i in range(100)]
        ours, theirs = _run_lockstep(gs)
        assert np.abs(ours - theirs).max() < 1e-6

    def test_matches_torch_stationary(self):
        rs = np.random.RandomState(1)
        gs = [rs.randn(8).astype(np.float32) for _ in range(50)]
        ours, theirs = _run_lockstep(gs, lr=1e-2)
        assert np.abs(ours - theirs).max() < 5e-6

    def test_optax_amsgrad_differs(self):
        """Documents why ops/optim.py exists: optax's variant diverges."""
        rs = np.random.RandomState(0)
        gs = [rs.randn(16).astype(np.float32) * (10.0 if i == 3 else 1.0)
              for i in range(100)]
        p0 = np.linspace(-1, 1, 16).astype(np.float32)
        tx = optax.amsgrad(1e-3)
        pj = jnp.asarray(p0.copy())
        st = tx.init(pj)
        for g in gs:
            u, st = tx.update(jnp.asarray(g), st, pj)
            pj = optax.apply_updates(pj, u)
        _, theirs = _run_lockstep(gs)
        assert np.abs(np.asarray(pj) - theirs).max() > 1e-3

    def test_pytree_params_and_traced_lr(self):
        """Works on nested pytrees with a traced learning rate (vmap_grid path)."""
        params = {'a': {'w': jnp.ones((3, 2)), 'b': jnp.zeros((2,))},
                  'c': jnp.full((4,), 2.0)}
        grads = jax.tree_util.tree_map(lambda p: jnp.ones_like(p) * 0.1, params)

        def one_step(lr):
            tx = optim.amsgrad(lr)
            st = tx.init(params)
            u, _ = tx.update(grads, st, params)
            return optax.apply_updates(params, u)

        out = jax.vmap(one_step)(jnp.asarray([1e-3, 1e-2]))
        # first-step Adam update is -lr * sign-ish step
        delta = np.asarray(out['c']) - 2.0
        assert np.allclose(delta[0], -1e-3, rtol=1e-3)
        assert np.allclose(delta[1], -1e-2, rtol=1e-3)
