"""Sharded data-parallel training over a jax device mesh.

The reference's only device parallelism is single-process
``nn.DataParallel`` over GPUs for the AEs (behavenet/models/base.py:106-116,
ae_grid_search.py:93-95, "currently only implemented for AEs"). The
TPU-native equivalent: a 1-D ``jax.sharding.Mesh`` over chips with the
frame axis of each trial-batch sharded across the ``dp`` axis and parameters
replicated. Gradients are all-reduced by XLA collectives over ICI — no
explicit communication code. Hyperparameter grid trials remain
embarrassingly parallel across hosts/slices (DCN traffic is zero during
training, matching the reference's process-per-trial model).
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ['make_mesh', 'shard_batch', 'replicate', 'make_dp_train_functions',
           'pad_batch_to_multiple']


def make_mesh(n_devices=None, axis_name='dp'):
    """1-D mesh over the first ``n_devices`` devices (default: all)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def pad_batch_to_multiple(batch, multiple):
    """Pad the leading (frame) axis of every array to a multiple of ``multiple``.

    Returns (padded_batch, n_valid). The AE-family losses are means over
    frames; the dp train step rescales by n_total/n_valid so padded frames
    contribute zero.
    """
    out = {}
    n = None
    for key, val in batch.items():
        arr = np.asarray(val)
        n = arr.shape[0]
        rem = (-n) % multiple
        if rem:
            pad_width = [(0, rem)] + [(0, 0)] * (arr.ndim - 1)
            arr = np.pad(arr, pad_width)
        out[key] = arr
    return out, n


def shard_batch(batch, mesh, axis_name='dp'):
    """Place a batch dict with leading frame axis sharded across the mesh."""
    sharding = NamedSharding(mesh, P(axis_name))
    return {k: jax.device_put(v, sharding) for k, v in batch.items()}


def replicate(tree, mesh):
    """Replicate a pytree (params/opt state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def make_dp_train_functions(model, hparams, mesh, axis_name='dp'):
    """Data-parallel (optimizer, train_step, eval_step) over ``mesh``.

    The returned train_step has params/opt_state replicated and batches
    sharded along the frame axis; XLA inserts the gradient all-reduce over
    ICI. Mean-reduction losses are exact because every device sees
    ``frames/n_devices`` rows (callers pad with
    :func:`pad_batch_to_multiple` and the masked losses ignore pad rows).
    """
    from behavenet_tpu.fitting.training import make_train_functions

    tx, train_step, eval_step = make_train_functions(model, hparams)

    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(axis_name))

    n_dev = mesh.devices.size

    def _put(batch):
        # exact-shape batches (multi-session seg_lens) may not divide the
        # mesh; replicate those instead of failing the shard
        return {
            k: jax.device_put(
                v, shard if np.asarray(v).shape[0] % n_dev == 0 else repl)
            for k, v in batch.items()}

    def dp_train_step(params, opt_state, rng, batch, loss_kwargs, dataset=0, seg_lens=None):
        batch = _put(batch)
        params = jax.device_put(params, repl)
        opt_state = jax.device_put(opt_state, repl)
        return train_step(params, opt_state, rng, batch, loss_kwargs, dataset, seg_lens)

    def dp_eval_step(params, rng, batch, loss_kwargs, dataset=0, seg_lens=None):
        batch = _put(batch)
        params = jax.device_put(params, repl)
        return eval_step(params, rng, batch, loss_kwargs, dataset, seg_lens)

    return tx, dp_train_step, dp_eval_step
