"""Tensor-parallel (channel-sharded) AE-family training over a dp x tp mesh.

The reference's architecture generator gates candidate networks on a GPU
memory budget (``mem_limit_gb``, reference
ae_model_architecture_generator.py:8,597) and simply *rejects* archs that
don't fit one device. The TPU-native alternative: shard the channel axis of
every conv/conv-transpose layer (weights, biases, batch-norm parameters, and
— by GSPMD propagation — the activations, which dominate memory for video
autoencoders) across a ``tp`` mesh axis, so per-chip activation memory
scales as ``1/tp`` and archs over the single-chip budget train instead of
being rejected.

Implementation is the scaling-book recipe, not hand-written collectives:
declare a :class:`jax.sharding.Mesh` with ``('dp', 'tp')`` axes, commit
parameters with channel shardings (:func:`tp_param_shardings`), shard the
batch frame axis over ``dp``, and let XLA's SPMD partitioner insert the
all-reduce / all-gather collectives over ICI. The jitted train step is the
exact same program as the single-chip one (global semantics), so results
are bit-comparable — asserted by tests/test_parallel/test_tp.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.tree_util import DictKey

__all__ = ['make_mesh_2d', 'tp_param_shardings', 'tp_shard',
           'make_tp_train_functions']

# param-dict key prefixes whose leaves carry a channel axis
_CONV_PREFIXES = ('conv_', 'convt_')
_BN_PREFIX = 'bn_'


def make_mesh_2d(n_dp, n_tp, axis_names=('dp', 'tp'), devices=None):
    """(n_dp, n_tp) mesh over the first n_dp*n_tp local devices."""
    if devices is None:
        devices = jax.devices()
    n = n_dp * n_tp
    if len(devices) < n:
        raise ValueError('need %d devices for a (%d, %d) mesh, have %d'
                         % (n, n_dp, n_tp, len(devices)))
    return Mesh(np.asarray(devices[:n]).reshape(n_dp, n_tp), axis_names)


def _dict_names(path):
    return [p.key for p in path if isinstance(p, DictKey)]


def tp_param_shardings(tree, mesh, tp_axis='tp'):
    """Channel shardings for an AE-family params (or optax-state) pytree.

    Rules, keyed on the param-dict names along each leaf's path (optax
    states mirror the params tree, so the same rules apply to them):

    - ``conv_%d`` / ``convt_%d`` leaves: shard the trailing (out-channel)
      axis over ``tp`` when divisible — covers kernels ``(kh, kw, cin,
      cout)``, biases ``(cout,)``, and per-session stacked variants.
    - ``bn_%d`` vector leaves (gamma/beta/running stats, shape ``(ch,)``):
      shard over ``tp`` so they line up with the channel-sharded
      activations; the scalar ``num_batches`` replicates.
    - everything else (dense heads, scalars) replicates — the encoder
      bottleneck is tiny (n_latents), and its flatten interleaves channels
      with pixels, so channel sharding doesn't extend through it.
    """
    tp = mesh.shape[tp_axis]
    repl = NamedSharding(mesh, P())

    def rule(path, leaf):
        shape = jnp.shape(leaf)
        names = _dict_names(path)
        if any(n.startswith(_CONV_PREFIXES) for n in names):
            if len(shape) >= 1 and shape[-1] >= tp and shape[-1] % tp == 0:
                return NamedSharding(
                    mesh, P(*([None] * (len(shape) - 1) + [tp_axis])))
            return repl
        if any(n.startswith(_BN_PREFIX) for n in names):
            if len(shape) == 1 and shape[0] % tp == 0:
                return NamedSharding(mesh, P(tp_axis))
            return repl
        return repl

    return jax.tree_util.tree_map_with_path(rule, tree)


def tp_shard(tree, mesh, tp_axis='tp'):
    """Commit a params/opt-state pytree to its channel shardings.

    No-op (no copy) for leaves already placed with the same sharding, so
    calling this on every step is free after the first.
    """
    shardings = tp_param_shardings(tree, mesh, tp_axis)
    return jax.tree_util.tree_map(jax.device_put, tree, shardings)


def make_tp_train_functions(model, hparams, mesh, dp_axis='dp', tp_axis='tp'):
    """Tensor(+data)-parallel (optimizer, train_step, eval_step) over ``mesh``.

    ``mesh`` may be 2-D ``('dp', 'tp')`` (frames sharded over dp, channels
    over tp) or 1-D ``('tp',)`` (pure model parallelism — every device sees
    the full batch but 1/tp of each conv). The wrapped steps re-commit
    placements each call (free once placed) and otherwise run the exact
    single-chip program; XLA SPMD inserts the collectives.
    """
    from behavenet_tpu.fitting.training import make_train_functions

    tx, train_step, eval_step = make_train_functions(model, hparams)

    has_dp = dp_axis in mesh.axis_names
    n_dp = mesh.shape[dp_axis] if has_dp else 1
    repl = NamedSharding(mesh, P())
    frame_shard = NamedSharding(mesh, P(dp_axis)) if has_dp else repl

    def _put_batch(batch):
        # exact-shape batches (multi-session seg_lens) may not divide the
        # dp axis; replicate those instead of failing the shard
        return {
            k: jax.device_put(
                v, frame_shard if np.asarray(v).shape[0] % n_dp == 0 else repl)
            for k, v in batch.items()}

    def tp_train_step(params, opt_state, rng, batch, loss_kwargs,
                      dataset=0, seg_lens=None):
        params = tp_shard(params, mesh, tp_axis)
        opt_state = tp_shard(opt_state, mesh, tp_axis)
        return train_step(params, opt_state, rng, _put_batch(batch),
                          loss_kwargs, dataset, seg_lens)

    def tp_eval_step(params, rng, batch, loss_kwargs, dataset=0, seg_lens=None):
        params = tp_shard(params, mesh, tp_axis)
        return eval_step(params, rng, _put_batch(batch), loss_kwargs,
                         dataset, seg_lens)

    return tx, tp_train_step, tp_eval_step
