"""Functional model scaffolding: initializers, param utilities, base protocol.

Replaces the reference's torch BaseModule/BaseModel (behavenet/models/base.py)
with a pure-functional pattern: each model is an object holding *static*
configuration built from hparams; ``init(rng)`` returns a parameter pytree
(nested dicts of jnp arrays) and all compute methods are pure functions of
(params, batch) suitable for jit/grad/vmap.

Initializer distributions match torch defaults (kaiming-uniform with
a=sqrt(5), i.e. U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both weights and
biases) so training trajectories are statistically comparable with the
reference.
"""

import pickle

import jax
import jax.numpy as jnp
import numpy as np


def uniform_fan_in(key, shape, fan_in, dtype=jnp.float32):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) — torch's default conv/linear init."""
    bound = 1.0 / np.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def init_conv(key, kh, kw, c_in, c_out, dtype=jnp.float32):
    """Conv kernel (HWIO) + bias with torch Conv2d default init."""
    k_w, k_b = jax.random.split(key)
    fan_in = c_in * kh * kw
    return {
        'w': uniform_fan_in(k_w, (kh, kw, c_in, c_out), fan_in, dtype),
        'b': uniform_fan_in(k_b, (c_out,), fan_in, dtype),
    }


def init_conv_transpose(key, kh, kw, c_in, c_out, dtype=jnp.float32):
    """ConvTranspose kernel (HWIO, forward orientation) + bias.

    torch ConvTranspose2d init uses fan_in computed from weight shape
    (in_channels, out_channels/groups, k, k) -> fan_in = out_channels*k*k.
    """
    k_w, k_b = jax.random.split(key)
    fan_in = c_out * kh * kw
    return {
        'w': uniform_fan_in(k_w, (kh, kw, c_in, c_out), fan_in, dtype),
        'b': uniform_fan_in(k_b, (c_out,), fan_in, dtype),
    }


def init_linear(key, d_in, d_out, dtype=jnp.float32, bias=True):
    """Dense weight (d_in, d_out) + bias with torch Linear default init."""
    k_w, k_b = jax.random.split(key)
    params = {'w': uniform_fan_in(k_w, (d_in, d_out), d_in, dtype)}
    if bias:
        params['b'] = uniform_fan_in(k_b, (d_out,), d_in, dtype)
    return params


def init_diag_linear(key, dim, dtype=jnp.float32):
    """Diagonal linear map y = x*d + b (reference base.py:70 DiagLinear)."""
    k_d, k_b = jax.random.split(key)
    bound = 1.0 / np.sqrt(dim)
    return {
        'd': jax.random.uniform(k_d, (dim,), dtype, minval=-bound, maxval=bound),
        'b': jax.random.uniform(k_b, (dim,), dtype, minval=-bound, maxval=bound),
    }


def diag_linear(params, x):
    """Apply diagonal linear map."""
    return x * params['d'] + params['b']


def param_count(params):
    """Total number of scalars in a parameter pytree."""
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))


def params_finite(params):
    """True when every leaf of the parameter pytree is finite."""
    return all(bool(np.isfinite(np.asarray(p)).all())
               for p in jax.tree_util.tree_leaves(params))


def save_params(params, filepath, extra=None):
    """Persist a parameter pytree (host numpy) to ``filepath`` via pickle.

    Plays the role of torch ``state_dict`` checkpoints (reference
    base.py:61-63); the file keeps the reference's ``best_val_model.pt``
    naming so the experiment-store layout is unchanged.
    """
    host = jax.tree_util.tree_map(np.asarray, params)
    payload = {'params': host}
    if extra is not None:
        payload.update(extra)
    with open(filepath, 'wb') as f:
        pickle.dump(payload, f)


def load_params(filepath):
    """Load a parameter pytree saved by :func:`save_params`."""
    with open(filepath, 'rb') as f:
        payload = pickle.load(f)
    params = jax.tree_util.tree_map(jnp.asarray, payload['params'])
    return params, {k: v for k, v in payload.items() if k != 'params'}


class BaseModel:
    """Protocol for all models.

    Subclasses define:
      - ``init(rng) -> params``
      - ``forward(params, x, ...) -> outputs``
      - ``loss_fn(params, batch, rng) -> (scalar_loss, metrics_dict)`` —
        differentiable; the trainer wraps it in value_and_grad.
      - ``metrics_keys`` — ordered metric names logged to metrics.csv.
    """

    variational = False

    def init(self, rng):
        raise NotImplementedError

    def forward(self, params, x, **kwargs):
        raise NotImplementedError

    def loss_fn(self, params, batch, rng):
        raise NotImplementedError
