"""Training loop: jitted optax train steps, early stopping, metric logging.

Behavioral contract follows the reference (behavenet/fitting/training.py):
- Adam with amsgrad and l2 via weight decay-in-gradient (training.py:284-286)
- epoch 0 is an eval-only pass of the randomly initialized model (:320-322)
- per-epoch deterministic reseeding of batching order for restartability
  (:327-328)
- validation checks on a precomputed batch schedule supporting fractional
  val_check_interval (:302-306)
- best-model checkpoint on aggregate val-loss improvement (:388-397)
- per-trial test metric rows at the end (:435-447)
- export of latents/predictions dispatched by method (:452-461)

TPU-native design: each (model, trial-shape) pair compiles once to a fused
XLA train step (forward + loss + backward + optimizer update) with donated
params/opt state; uint8 image batches are normalized to [0,1] float32 on
device inside the jitted step; metric scalars stay on device during the
epoch and are only pulled back when a csv row is written, keeping dispatch
asynchronous.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from behavenet_tpu.models import base as models_base
from behavenet_tpu.ops import optim

__all__ = ['Logger', 'EarlyStopping', 'fit', 'print_epoch']


def print_epoch(curr, total):
    """Pretty-print epoch counter with width matched to ``total``
    (reference behavenet/fitting/training.py:464-478)."""
    width = max(1, len(str(int(total))))
    print(('epoch %%0%ii/%%0%ii' % (width, width)) % (curr, total))


class Logger(object):
    """Per-epoch metric accumulation feeding metrics.csv rows.

    Metric dicts arrive straight from the jitted steps as device scalars and
    are appended as-is — no per-batch host transfer, no per-batch device
    dispatch. Everything is pulled back in one batched ``np.asarray`` sweep
    only when a csv row is written, so the train loop stays asynchronous
    between logging points.

    (reference behavenet/fitting/training.py:16-170 contract: rows carry
    ``tr_``/``val_``/``test_``-prefixed per-key means plus epoch / batch /
    trial / dataset columns, ``best_val_epoch`` on val rows, dataset=-1 for
    aggregate rows; the accumulation mechanics here are original.)
    """

    _PREFIX = {'train': 'tr', 'val': 'val', 'test': 'test'}

    def __init__(self, n_datasets=1):
        self.n_datasets = n_datasets
        self._entries = {dtype: [] for dtype in self._PREFIX}

    def reset_metrics(self, dtype):
        self._entries[dtype] = []

    def update_metrics(self, dtype, loss_dict, dataset=None):
        self._entries[dtype].append((dataset, dict(loss_dict)))

    def _means(self, dtype, dataset=None):
        """Key-wise means over accumulated entries (one host sweep)."""
        picked = [m for d, m in self._entries[dtype]
                  if dataset is None or d == dataset]
        out = {}
        for key in {k for m in picked for k in m}:
            vals = [np.asarray(m[key]) for m in picked if key in m]
            out[key] = float(np.mean(vals))
        return out

    def create_metric_row(self, dtype, epoch, batch, dataset, trial, best_epoch=None,
                          by_dataset=False):
        if dtype not in self._PREFIX:
            raise ValueError('%s is an invalid data type' % dtype)
        prefix = self._PREFIX[dtype]
        row = {'epoch': epoch, 'batch': batch, 'trial': trial}
        if dtype == 'val':
            row['best_val_epoch'] = best_epoch
        restrict = dataset if (by_dataset and self.n_datasets > 1) else None
        row['dataset'] = dataset if restrict is not None else -1
        for key, val in self._means(dtype, dataset=restrict).items():
            row['%s_%s' % (prefix, key)] = val
        return row

    def get_loss(self, dtype):
        return float(np.mean([np.asarray(m['loss'])
                              for _, m in self._entries[dtype]]))


class EarlyStopping(object):
    """Patience on the best validation loss, with a minimum-epoch floor.

    (reference behavenet/fitting/training.py:173-242 contract: stop only
    after ``min_epochs``, after ``patience`` consecutive non-improving val
    checks; ``delta`` is the required improvement margin.)
    """

    def __init__(self, patience=10, min_epochs=10, delta=0):
        self.patience = patience
        self.min_epochs = min_epochs
        self.delta = delta
        self.counter = 0
        self.best_epoch = 0
        self.best_loss = np.inf
        self.stopped_epoch = 0
        self.should_stop = False

    def on_val_check(self, epoch, curr_loss):
        if curr_loss < self.best_loss - self.delta:
            self.best_loss = curr_loss
            self.best_epoch = epoch
            self.counter = 0
        else:
            self.counter += 1
        if epoch > self.min_epochs and self.counter >= self.patience:
            self.stopped_epoch = epoch
            self.should_stop = True
            print('early stop at epoch %i: no val improvement for %i checks '
                  '(best %.6f @ epoch %i, current %.6f)'
                  % (epoch, self.counter, self.best_loss, self.best_epoch, curr_loss))


def _prepare_batch(sample, model_class, hparams):
    """Map a generator sample dict to the model's device batch dict (host side).

    Images remain uint8 here; normalization happens inside the jitted step.
    """
    batch = {}
    for key in ('images', 'masks', 'labels', 'labels_sc', 'labels_masks'):
        if key in sample:
            batch[key] = sample[key]
    if 'input_signal' in hparams and hparams.get('output_signal'):
        ins, outs = hparams['input_signal'], hparams['output_signal']
        if ins in sample and outs in sample and model_class not in (
                'labels-images',):
            batch = {'predictors': sample[ins], 'targets': sample[outs]}
    return batch


def _normalize_images(batch):
    """uint8 images -> [0,1] float32 (device-side, traced)."""
    out = dict(batch)
    if 'images' in out and out['images'].dtype == jnp.uint8:
        out['images'] = out['images'].astype(jnp.float32) / 255.0
    if 'targets' in out and out['targets'].dtype == jnp.int32:
        pass
    return out


_STATE_LEAVES = ('running_mean', 'running_var', 'num_batches')


def merge_state(params, state):
    """Recursively overwrite ``params`` leaves with ``state`` leaves.

    ``state`` is a sparse mirror of the params tree (e.g. BatchNorm running
    statistics emitted by a train step under the '_state' metrics key);
    leaves not present in ``state`` are kept from ``params``.
    """
    out = dict(params)
    for k, v in state.items():
        if isinstance(v, dict) and isinstance(params.get(k), dict):
            out[k] = merge_state(params[k], v)
        else:
            out[k] = v
    return out


def make_train_functions(model, hparams):
    """Build (optimizer, jitted train_step, jitted eval_step) for a model."""
    lr = hparams['learning_rate']
    wd = hparams.get('l2_reg', 0) or 0
    # models with BN running statistics (has_state) emit updated stats in
    # the aux metrics under '_state'; the train step merges them into
    # params after the optimizer update (they receive zero gradient so the
    # Adam step leaves them untouched)
    has_state = bool(getattr(model, 'has_state', False))

    chain = []
    if wd > 0:
        if hasattr(model, 'trainable_mask'):
            base_mask_fn = model.trainable_mask
        else:
            def base_mask_fn(params):
                return jax.tree_util.tree_map(lambda _: True, params)

        def mask_fn(params):
            # never weight-decay non-trainable state (BN running stats)
            mask = base_mask_fn(params)

            def fix(path, m):
                last = path[-1]
                name = last.key if isinstance(last, jax.tree_util.DictKey) else None
                return False if name in _STATE_LEAVES else m
            return jax.tree_util.tree_map_with_path(fix, mask)
        # torch Adam weight_decay semantics: l2 added to gradients *before*
        # the moment updates (reference training.py:284-286)
        chain.append(optax.add_decayed_weights(wd, mask=mask_fn))
    # 'amsgrad' (torch-exact, the reference's optimizer) is the default;
    # 'sgd' is a diagnostics hook: plain SGD has no moment normalizer, so
    # dead-parameter gradient noise (pre-BN conv biases) stays at noise
    # scale instead of being amplified to lr scale — used by the strict
    # tp param-equivalence tests on BatchNorm archs
    opt_name = hparams.get('optimizer', 'amsgrad')
    if opt_name == 'amsgrad':
        chain.append(optim.amsgrad(lr))
    elif opt_name == 'sgd':
        chain.append(optax.sgd(lr))
    else:
        raise ValueError('"%s" is not a valid optimizer' % opt_name)
    tx = optax.chain(*chain)

    def train_step(params, opt_state, rng, batch, loss_kwargs, dataset, seg_lens):
        batch = _normalize_images(batch)
        extra = {} if seg_lens is None else {'seg_lens': seg_lens}
        if has_state:
            extra['train'] = True

        def lf(p):
            return model.loss_fn(p, batch, rng, dataset=dataset, **extra, **loss_kwargs)
        (_, metrics), grads = jax.value_and_grad(lf, has_aux=True)(params)
        state = metrics.pop('_state', None)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if state is not None:
            params = merge_state(params, state)
        return params, opt_state, metrics

    def eval_step(params, rng, batch, loss_kwargs, dataset, seg_lens):
        batch = _normalize_images(batch)
        extra = {} if seg_lens is None else {'seg_lens': seg_lens}
        _, metrics = model.loss_fn(params, batch, rng, dataset=dataset, **extra, **loss_kwargs)
        return metrics

    train_step = jax.jit(train_step, static_argnames=('dataset', 'seg_lens'),
                         donate_argnums=(0, 1))
    eval_step = jax.jit(eval_step, static_argnames=('dataset', 'seg_lens'))
    return tx, train_step, eval_step


def make_multi_step(model, hparams, tx):
    """k optimizer steps per device dispatch via lax.scan over stacked batches.

    Semantically identical to k sequential train steps (one trial = one
    optimizer step, reference contract preserved); amortizes per-dispatch
    host/RPC overhead, which dominates small trial batches. Batches in the
    stack must share shapes (length bucketing makes this the common case).
    """

    has_state = bool(getattr(model, 'has_state', False))

    def multi_step(params, opt_state, rngs, batch_stack, loss_kwargs, dataset):
        def body(carry, inp):
            params, opt_state = carry
            rng, batch = inp
            batch = _normalize_images(batch)
            extra = {'train': True} if has_state else {}

            def lf(p):
                return model.loss_fn(p, batch, rng, dataset=dataset, **extra, **loss_kwargs)
            (_, metrics), grads = jax.value_and_grad(lf, has_aux=True)(params)
            state = metrics.pop('_state', None)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            if state is not None:
                params = merge_state(params, state)
            return (params, opt_state), metrics

        (params, opt_state), metrics = jax.lax.scan(
            body, (params, opt_state), (rngs, batch_stack))
        return params, opt_state, metrics

    return jax.jit(multi_step, static_argnames=('dataset',), donate_argnums=(0, 1))


def _bucket_batch(batch, bucket):
    """Pad the frame axis up to the next multiple of ``bucket``; add frame_mask.

    Length-bucketing keeps the number of distinct compiled shapes small for
    variable-length trials (XLA requires static shapes); the masked losses
    reproduce the exact unpadded values.
    """
    n = next(iter(batch.values())).shape[0]
    T = -(-n // bucket) * bucket
    if T == n:
        out = dict(batch)
        out['frame_mask'] = np.ones(n, dtype=np.float32)
        return out
    out = {}
    for key, val in batch.items():
        arr = np.asarray(val)
        pad_width = [(0, T - n)] + [(0, 0)] * (arr.ndim - 1)
        out[key] = np.pad(arr, pad_width)
    fm = np.zeros(T, dtype=np.float32)
    fm[:n] = 1.0
    out['frame_mask'] = fm
    return out


def _collate(data, dataset, model_class, hparams):
    """Turn generator output into (batch, dataset_idx, seg_lens, trial_idx).

    MUST remain deterministic and thread-safe (no global numpy RNG, no
    shared mutable state): with ``prefetch_workers > 1`` the prefetch stage
    invokes it concurrently from pool threads, and bit-for-bit training /
    exact resume depend on every call being a pure function of its inputs.
    """
    if isinstance(data, list):
        # multi-session batch (MSPS-VAE): dataset-major concatenation of
        # per-session segments. Each segment buckets independently (padded
        # seg_lens stay static per bucket combination; frame masks drop the
        # pad rows out of every loss term including the triplets)
        bucket = hparams.get('shape_bucket', 32)
        parts = []
        for d in data:
            part = {k: np.asarray(d[k])
                    for k in ('images', 'labels', 'masks', 'labels_masks')
                    if k in d}
            if bucket:
                part = _bucket_batch(part, int(bucket))
            parts.append(part)
        seg_lens = tuple(int(next(iter(p.values())).shape[0]) for p in parts)
        batch = {k: np.concatenate([p[k] for p in parts], axis=0)
                 for k in parts[0]}
        trial = int(data[0]['batch_idx'])
        return batch, dataset, seg_lens, trial
    batch = _prepare_batch(data, model_class, hparams)
    bucket = hparams.get('shape_bucket', 32)
    if bucket:
        batch = _bucket_batch(batch, int(bucket))
    return batch, dataset, None, int(data['batch_idx'])


def fit(hparams, model, data_generator, exp, method='ae', warm_start=None):
    """Fit a model with SGD + early stopping, logging to the experiment store.

    ``method`` in {'ae', 'nll', 'conv-decoder'} controls final exports
    (reference training.py:244-461). ``warm_start``, if given, maps freshly
    initialized params to warm-started ones (pretrained AE loading,
    reference ae_grid_search.py:90).
    """
    params = model.init(jax.random.PRNGKey(hparams.get('rng_seed_model', 0)))
    if warm_start is not None:
        params = warm_start(params)
    n_dev = len(jax.devices())
    tp_dev = int(hparams.get('tp_devices', 0) or 0)
    if tp_dev > 1 and n_dev >= tp_dev:
        # tensor(+data)-parallel: conv channels shard over the tp axis
        # (per-chip activation memory scales 1/tp — archs over the
        # single-chip budget train instead of being rejected); any leftover
        # device factor becomes a dp axis sharding the frame dimension
        from behavenet_tpu.parallel.tp import make_mesh_2d, make_tp_train_functions
        n_dp = n_dev // tp_dev
        bucket = int(hparams.get('shape_bucket', 32) or 32)
        if bucket % n_dp:
            bucket = -(-bucket // n_dp) * n_dp
        hparams['shape_bucket'] = bucket
        mesh = make_mesh_2d(n_dp, tp_dev)
        print('tp sharding over a (%i, %i) dp x tp mesh (frame bucket %i)'
              % (n_dp, tp_dev, bucket))
        tx, train_step, eval_step = make_tp_train_functions(model, hparams, mesh)
    elif hparams.get('dp_sharding', False) and n_dev > 1:
        # data-parallel training over all local devices: batches shard along
        # the frame axis (length bucketing keeps it divisible), params
        # replicate, XLA inserts the gradient all-reduce over ICI
        from jax.sharding import Mesh
        from behavenet_tpu.parallel.mesh import make_dp_train_functions
        bucket = int(hparams.get('shape_bucket', 32) or 32)
        if bucket % n_dev:
            bucket = -(-bucket // n_dev) * n_dev
        hparams['shape_bucket'] = bucket
        mesh = Mesh(np.array(jax.devices()), ('dp',))
        print('dp sharding over %i devices (frame bucket %i)' % (n_dev, bucket))
        tx, train_step, eval_step = make_dp_train_functions(model, hparams, mesh)
    else:
        tx, train_step, eval_step = make_train_functions(model, hparams)
    opt_state = tx.init(params)

    # k optimizer steps per device dispatch (amortizes host/RPC overhead at
    # small trial-batch shapes; semantically identical to k single steps —
    # equivalence: tests/test_fitting/test_bucketing.py). Disabled under dp
    # sharding (the dp wrapper re-places inputs per step) and for
    # multi-session seg_lens batches (static per-segment lengths).
    steps_per_dispatch = int(hparams.get('steps_per_dispatch', 1) or 1)
    sharded = (tp_dev > 1 and n_dev >= tp_dev) or \
        (hparams.get('dp_sharding', False) and n_dev > 1)
    if steps_per_dispatch > 1 and not sharded:
        multi_step = make_multi_step(model, hparams, tx)
    else:
        multi_step = None
        steps_per_dispatch = 1

    logger = Logger(n_datasets=data_generator.n_datasets)

    if hparams['enable_early_stop']:
        early_stop = EarlyStopping(
            patience=hparams['early_stop_history'], min_epochs=hparams['min_n_epochs'])
    else:
        early_stop = None

    best_val_loss = np.inf
    best_val_epoch = None
    best_params = None
    val_check_batch = np.append(
        hparams['val_check_interval'] * data_generator.n_tot_batches['train'] *
        np.arange(1, int((hparams['max_n_epochs'] + 1) / hparams['val_check_interval'])),
        [data_generator.n_tot_batches['train'] * hparams['max_n_epochs'],
         data_generator.n_tot_batches['train'] * (hparams['max_n_epochs'] + 1)]).astype('int')

    if hparams.get('rng_seed_train', None) is None:
        rng_train = np.random.randint(0, 10000)
    else:
        rng_train = int(hparams['rng_seed_train'])

    expt_dir = os.path.join(hparams['expt_dir'], 'version_%i' % exp.version)
    model_class = hparams['model_class']

    def save_model(p, filepath):
        if hasattr(model.__class__, 'create_orthogonal_matrix'):
            # AEMSP refreshes its orthogonal completion at save time
            # (reference aes.py:1062-1065)
            p = model.__class__.create_orthogonal_matrix(p)
        models_base.save_params(p, filepath, extra={'model_class': model_class})
        return p

    key = jax.random.PRNGKey(rng_train)

    # profiling hooks: the reference has no perf tooling (SURVEY 5);
    # we log frames/sec per epoch and can emit a jax profiler trace
    profile_dir = hparams.get('profile_dir')
    profiling = False
    import time as _time

    # mid-training resume (the reference's acknowledged TODO,
    # training.py:9): full training state checkpoints each epoch; combined
    # with per-epoch batching reseeds this makes restarts exact
    import pickle as _pickle
    ckpt_file = os.path.join(expt_dir, 'last_checkpoint.pkl')
    start_epoch = 0
    if hparams.get('resume_version') is not None and os.path.exists(ckpt_file):
        with open(ckpt_file, 'rb') as f:
            ckpt = _pickle.load(f)
        params = jax.tree_util.tree_map(jnp.asarray, ckpt['params'])
        opt_state = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x) if isinstance(x, np.ndarray) else x,
            ckpt['opt_state'])
        key = jnp.asarray(ckpt['key'])
        # restore the batching-order seed: without this an UNSEEDED run
        # (rng_seed_train not set -> random rng_train) would resume with a
        # fresh seed and a different batch order than the original run
        rng_train = ckpt.get('rng_train', rng_train)
        best_val_loss = ckpt['best_val_loss']
        best_val_epoch = ckpt['best_val_epoch']
        start_epoch = ckpt['epoch'] + 1
        if os.path.exists(os.path.join(expt_dir, 'best_val_model.pt')):
            best_params, _ = models_base.load_params(
                os.path.join(expt_dir, 'best_val_model.pt'))
            best_model_saved_resume = True
        else:
            best_model_saved_resume = False
        print('resuming from epoch %i' % start_epoch)
    else:
        best_model_saved_resume = False

    i_epoch = 0
    best_model_saved = best_model_saved_resume
    dataset = None
    for i_epoch in range(start_epoch, hparams['max_n_epochs'] + 1):
        # epoch 0 evaluates the randomly initialized model (reference :320-322)

        np.random.seed(rng_train + i_epoch)  # restartable batching order
        logger.reset_metrics('train')
        data_generator.reset_iterators('train')
        loss_kwargs = model.loss_kwargs(i_epoch) if hasattr(model, 'loss_kwargs') else {}

        if profile_dir and i_epoch == 1:
            jax.profiler.start_trace(profile_dir)
            profiling = True

        t_epoch = _time.perf_counter()
        n_frames_epoch = 0
        from behavenet_tpu.data.prefetch import prefetched
        # prefetch_workers > 1 moves collation + the host->device transfer
        # into a thread pool (order-preserving) so several uploads are in
        # flight — useful when storage or the host->device link is slow
        # relative to the step time. Default 1 keeps today's exact behavior.
        pf_workers = int(hparams.get('prefetch_workers', 1))
        pf_stage = None
        if pf_workers > 1:
            def pf_stage(item):
                data_s, dataset_s = item
                if data_s is None:
                    return data_s, dataset_s, None
                pre = _collate(data_s, dataset_s, model_class, hparams)
                if multi_step is not None:
                    # spd>1 restacks batches host-side before dispatch: keep
                    # the collated batch in numpy (no early device_put)
                    return data_s, dataset_s, pre
                return data_s, dataset_s, (jax.device_put(pre[0]),) + pre[1:]
        train_iter = prefetched(
            lambda: data_generator.next_batch('train'),
            data_generator.n_tot_batches['train'],
            depth=int(hparams.get('prefetch_depth', 2)),
            stage_fn=pf_stage, workers=pf_workers)
        # dispatch buffer for steps_per_dispatch > 1: consecutive train
        # batches with identical (dataset, shapes) stack into one scanned
        # device call; partial groups run through the single-step path so
        # only one extra compile shape exists per bucket
        pending = []
        pending_sig = None

        def flush_pending():
            nonlocal params, opt_state, pending
            if not pending:
                return
            if multi_step is not None and len(pending) == steps_per_dispatch:
                rngs = jnp.stack([p[0] for p in pending])
                stack = {k: np.stack([np.asarray(p[1][k]) for p in pending])
                         for k in pending[0][1]}
                ds0 = pending[0][2]
                params, opt_state, mstack = multi_step(
                    params, opt_state, rngs, stack, loss_kwargs, ds0)
                mstack = {k: np.asarray(v) for k, v in mstack.items()}
                for j in range(len(pending)):
                    logger.update_metrics(
                        'train', {k: v[j] for k, v in mstack.items()}, dataset=ds0)
            else:
                for rng, b, d in pending:
                    params, opt_state, m = train_step(
                        params, opt_state, rng, b, loss_kwargs, d, None)
                    logger.update_metrics('train', m, dataset=d)
            pending = []

        for i_train, item in enumerate(train_iter):
            data, dataset = item[0], item[1]
            pre = item[2] if len(item) > 2 else None
            will_log = (i_train + 1) % data_generator.n_tot_batches['train'] == 0
            will_val = np.any(
                (i_train + 1) + i_epoch * data_generator.n_tot_batches['train']
                == val_check_batch)
            if data is not None:
                batch, ds, seg_lens, _ = pre if pre is not None else \
                    _collate(data, dataset, model_class, hparams)
                ds_idx = 0 if isinstance(ds, list) else ds
                key, sub = jax.random.split(key)
                if i_epoch > 0 and multi_step is not None and seg_lens is None:
                    sig = (ds_idx, tuple(sorted(
                        (k, tuple(v.shape), str(v.dtype))
                        for k, v in batch.items())))
                    if pending and sig != pending_sig:
                        flush_pending()
                    pending.append((sub, batch, ds_idx))
                    pending_sig = sig
                    if len(pending) == steps_per_dispatch or will_log or will_val:
                        flush_pending()
                elif i_epoch > 0:
                    params, opt_state, metrics = train_step(
                        params, opt_state, sub, batch, loss_kwargs, ds_idx, seg_lens)
                    logger.update_metrics('train', metrics, dataset=ds_idx)
                else:
                    metrics = eval_step(params, sub, batch, loss_kwargs, ds_idx, seg_lens)
                    logger.update_metrics('train', metrics, dataset=ds_idx)
                first = next(iter(batch.values()))
                n_frames_epoch += int(first.shape[0])
            elif will_log or will_val:
                flush_pending()

            if will_log:
                exp.log(logger.create_metric_row(
                    'train', i_epoch, i_train, -1, trial=-1,
                    by_dataset=False, best_epoch=best_val_epoch))
                if data_generator.n_datasets > 1 and dataset is not None and \
                        isinstance(dataset, int):
                    for d in range(data_generator.n_datasets):
                        exp.log(logger.create_metric_row(
                            'train', i_epoch, i_train, d, trial=-1,
                            by_dataset=True, best_epoch=best_val_epoch))
                exp.save()

            if will_val:
                logger.reset_metrics('val')
                data_generator.reset_iterators('val')
                for _ in range(data_generator.n_tot_batches['val']):
                    data, d_val = data_generator.next_batch('val')
                    batch, ds, seg_lens, _ = _collate(data, d_val, model_class, hparams)
                    ds_idx = 0 if isinstance(ds, list) else ds
                    key, sub = jax.random.split(key)
                    metrics = eval_step(params, sub, batch, loss_kwargs, ds_idx, seg_lens)
                    logger.update_metrics('val', metrics, dataset=ds_idx)

                if logger.get_loss('val') < best_val_loss:
                    best_val_loss = logger.get_loss('val')
                    params = save_model(params, os.path.join(expt_dir, 'best_val_model.pt'))
                    best_model_saved = True
                    # deep copy: train_step donates `params` buffers in place
                    best_params = jax.tree_util.tree_map(
                        lambda x: jnp.array(np.asarray(x)), params)
                    best_val_epoch = i_epoch

                exp.log(logger.create_metric_row(
                    'val', i_epoch, i_train, -1, trial=-1,
                    by_dataset=False, best_epoch=best_val_epoch))
                if data_generator.n_datasets > 1 and isinstance(dataset, int):
                    for d in range(data_generator.n_datasets):
                        exp.log(logger.create_metric_row(
                            'val', i_epoch, i_train, d, trial=-1,
                            by_dataset=True, best_epoch=best_val_epoch))
                exp.save()

        flush_pending()

        if profiling:
            jax.profiler.stop_trace()
            profiling = False
            print('wrote profiler trace to %s' % profile_dir)

        dt = _time.perf_counter() - t_epoch
        if i_epoch > 0 and dt > 0:
            print('epoch %03i/%03i: %.2fs, %.0f frames/sec' % (
                i_epoch, hparams['max_n_epochs'], dt, n_frames_epoch / dt))

        # full-state checkpoint for exact mid-training resume
        if hparams.get('checkpoint_interval', 1):
            if i_epoch % int(hparams.get('checkpoint_interval', 1)) == 0:
                with open(os.path.join(expt_dir, 'last_checkpoint.pkl'), 'wb') as f:
                    _pickle.dump({
                        'params': jax.tree_util.tree_map(np.asarray, params),
                        'opt_state': jax.tree_util.tree_map(
                            lambda x: np.asarray(x) if hasattr(x, 'shape') else x,
                            opt_state),
                        'key': np.asarray(key),
                        'rng_train': rng_train,
                        'epoch': i_epoch,
                        'best_val_loss': best_val_loss,
                        'best_val_epoch': best_val_epoch,
                    }, f)

        if hparams['enable_early_stop']:
            early_stop.on_val_check(i_epoch, logger.get_loss('val'))
            if early_stop.should_stop:
                break

    if not best_model_saved:
        params = save_model(params, os.path.join(expt_dir, 'best_val_model.pt'))
        best_params = jax.tree_util.tree_map(lambda x: jnp.array(np.asarray(x)), params)

    if hparams.get('save_last_model', False):
        save_model(params, os.path.join(expt_dir, 'last_model.pt'))

    # test metrics, logged per trial (reference :435-447)
    data_generator.reset_iterators('test')
    loss_kwargs = model.loss_kwargs(i_epoch) if hasattr(model, 'loss_kwargs') else {}
    for i_test in range(data_generator.n_tot_batches['test']):
        data, dataset = data_generator.next_batch('test')
        batch, ds, seg_lens, trial = _collate(data, dataset, model_class, hparams)
        ds_idx = 0 if isinstance(ds, list) else ds
        logger.reset_metrics('test')
        key, sub = jax.random.split(key)
        metrics = eval_step(best_params, sub, batch, loss_kwargs, ds_idx, seg_lens)
        logger.update_metrics('test', metrics, dataset=ds_idx)
        exp.log(logger.create_metric_row(
            'test', i_epoch, i_test, ds_idx, trial=trial, by_dataset=True))
    exp.save()

    # exports
    if method == 'ae' and hparams.get('export_latents', False):
        print('exporting latents')
        from behavenet_tpu.fitting.eval import export_latents
        export_latents(data_generator, model, best_params,
                       version=exp.version, expt_dir=hparams['expt_dir'])
    elif method == 'nll' and hparams.get('export_predictions', False):
        print('exporting predictions')
        from behavenet_tpu.fitting.eval import export_predictions
        export_predictions(data_generator, model, best_params,
                           version=exp.version, expt_dir=hparams['expt_dir'])
    elif method == 'conv-decoder' and hparams.get('export_predictions', False):
        # the reference warns and skips here (training.py:459-461); we export
        print('exporting image predictions')
        from behavenet_tpu.fitting.eval import export_predictions_conv_decoder
        export_predictions_conv_decoder(data_generator, model, best_params,
                                        version=exp.version,
                                        expt_dir=hparams['expt_dir'])

    return best_params
