"""Optimizers with exact torch semantics.

The reference trains every model with ``torch.optim.Adam(..., amsgrad=True)``
(reference fitting/training.py:284-286). ``optax.amsgrad`` is *not* that
optimizer: optax maxes the bias-corrected second moment
(``nu_max = max(nu_max, nu_hat_t)``), while torch maxes the raw moment and
re-divides by the *current* step's bias correction
(``denom = sqrt(max_s nu_s) / sqrt(1 - b2^t) + eps``). Because the
correction factor keeps shrinking the early maxima, the two disagree at the
percent level whenever an early gradient spike sets the max — enough to
break lockstep training parity (found round 4 via the MLP-decoder parity
harness). This module implements the torch recursion exactly.
"""

from typing import NamedTuple

import chex
import jax
import jax.numpy as jnp
import optax

__all__ = ['amsgrad', 'scale_by_amsgrad_torch']


class ScaleByAmsgradTorchState(NamedTuple):
    count: chex.Array  # shape (), int32
    mu: optax.Updates
    nu: optax.Updates
    nu_max: optax.Updates


def scale_by_amsgrad_torch(b1=0.9, b2=0.999, eps=1e-8):
    """Rescale updates via torch's AMSGrad recursion (see module docstring)."""

    def init_fn(params):
        zeros = lambda: jax.tree_util.tree_map(  # noqa: E731
            lambda p: jnp.zeros_like(p, dtype=jnp.promote_types(p.dtype, jnp.float32)),
            params)
        return ScaleByAmsgradTorchState(
            count=jnp.zeros([], jnp.int32), mu=zeros(), nu=zeros(), nu_max=zeros())

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1
        mu = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1.0 - b1) * g, state.mu, updates)
        nu = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1.0 - b2) * (g * g), state.nu, updates)
        nu_max = jax.tree_util.tree_map(jnp.maximum, state.nu_max, nu)
        c = count.astype(jnp.float32)
        bc1 = 1.0 - jnp.power(jnp.float32(b1), c)
        # torch: denom = sqrt(nu_max) / sqrt(bc2) + eps, step = (mu / bc1) / denom
        inv_sqrt_bc2 = 1.0 / jnp.sqrt(1.0 - jnp.power(jnp.float32(b2), c))
        new_updates = jax.tree_util.tree_map(
            lambda m, v: (m / bc1) / (jnp.sqrt(v) * inv_sqrt_bc2 + eps),
            mu, nu_max)
        return new_updates, ScaleByAmsgradTorchState(
            count=count, mu=mu, nu=nu, nu_max=nu_max)

    return optax.GradientTransformation(init_fn, update_fn)


def amsgrad(learning_rate, b1=0.9, b2=0.999, eps=1e-8):
    """torch-exact ``Adam(lr, betas=(b1, b2), eps=eps, amsgrad=True)``.

    ``learning_rate`` may be a traced scalar (the vmapped grid trainer
    threads per-lane learning rates through it).
    """
    return optax.chain(
        scale_by_amsgrad_torch(b1=b1, b2=b2, eps=eps),
        optax.scale_by_learning_rate(learning_rate),
    )
