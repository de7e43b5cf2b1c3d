"""Grid-in-one-program: k hyperparameter trials in ONE jitted step.

k same-architecture trials (different learning rate, weight decay, loss
weights, init/train seeds) train over a leading trial axis inside one
program, consuming ONE host batch per step. What that buys — measured, not
assumed (tools/bench_vmap_grid.py, v5e, docs/tpu_design.md "Parallelism"):

- **Device compute is NOT the win.** The hoped-for effect (fill the
  latency-bound small-batch regime's idle tiles with other trials) does
  not materialize: `mode='vmap'` lowers every conv as a k-group grouped
  conv, which XLA scales linearly — 0.91-0.96x per trial. The default
  `mode='scan'` (lax.map over trials) runs each trial's step body at full
  speed: 1.00-1.02x per trial, slightly *above* 1 at k=8 because one
  dispatch amortizes over k optimizer steps.
- **The input pipeline IS the win.** All k trials share one disk -> host
  -> device stream, so wherever input binds (slow storage, remote links —
  e.g. real epochs through the axon tunnel are upload-bound at a few
  thousand frames/s) grid throughput approaches k times the reference's
  strictly sequential trial loop. The torch reference re-reads and
  re-uploads the dataset once per trial.
- **Multi-chip hosts shard the trial axis** (``mesh=`` /
  ``fit_vmap_grid(mesh='auto')``): the reference fans grid trials across
  local GPUs one-process-per-device (ae_grid_search.py:173-187); here the
  SAME grid-in-one-program step runs as a ``shard_map`` whose first mesh
  axis splits the trials, so an 8-chip host fits 8 trials concurrently off
  one data stream — n-times the device compute AND one stream, with
  per-trial numerics identical to the single-device step (the shard body
  is the same program; no collectives).

What may vary per trial (everything else must be identical — the trials
share one compiled program and one data stream):

- ``learning_rate``, ``l2_reg`` — traced into the optimizer update, which
  rebuilds the optax chain from per-trial scalars inside the step;
- ``rng_seed_model`` — per-trial init and per-step key streams
  (``rng_seed_train`` must be identical across the group: it sets the
  per-epoch batch order, and the trials share one data stream);
- any keyword of the model's ``loss_fn`` (``beta``, ``kl``, ``alpha``, …)
  — per-trial, per-epoch values stacked by :func:`stack_loss_kwargs`
  (this covers the PS-VAE alpha/beta search documented in
  docs/user_guide.psvae.md end to end).

Semantics match k independent fits up to f32 reassociation (the grouped
conv reduces in a different order); asserted by tests/test_fitting/
test_vmap_grid.py. Multisession ``seg_lens`` batches (the MSPS-VAE
α/β/δ search, reference docs/source/adv_user_guide.psvae_hparam_search
.rst:10-27) thread the static per-segment lengths through the jitted step
exactly like the sequential trainer: one compiled program per seg_lens
bucket combination, all k trials inside it.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from behavenet_tpu.ops import optim
from behavenet_tpu.fitting.training import (
    _STATE_LEAVES, _normalize_images, merge_state)

__all__ = ['init_trials', 'stack_loss_kwargs', 'make_vmap_grid_functions',
           'group_vmappable', 'fit_vmap_grid', 'default_grid_mesh',
           'group_resume_versions']

# hparams a trial may override besides loss_fn keywords
_OPT_KEYS = ('learning_rate', 'l2_reg')
_SEED_KEYS = ('rng_seed_model', 'rng_seed_train')
# seed keys that may VARY across grouped trials: rng_seed_train is excluded
# because in a sequential fit it drives the per-epoch batch ORDER, and the
# grouped trials share one data stream — a per-trial batch order cannot be
# reproduced, so trials that vary it fall back to the sequential loop
_GROUPABLE_SEED_KEYS = ('rng_seed_model',)

# hparams that may vary across grid trials fitted in one program: they only
# reach the loss through per-trial init / optimizer scalars / per-epoch
# loss_kwargs (each trial's own model computes its schedules)
_VMAPPABLE_BY_CLASS = {
    'ae': set(),
    'vae': {'vae.beta', 'vae.beta_anneal_epochs'},
    'beta-tcvae': {'beta_tcvae.beta', 'beta_tcvae.beta_anneal_epochs'},
    'ps-vae': {'ps_vae.alpha', 'ps_vae.beta', 'ps_vae.anneal_epochs'},
    'msps-vae': {'ps_vae.alpha', 'ps_vae.beta', 'ps_vae.delta',
                 'ps_vae.anneal_epochs'},
}


def init_trials(make_model, base_hparams, trials):
    """Stack per-trial init params along a leading trial axis.

    ``make_model(hparams) -> model`` is called once per trial with the
    merged hparams, so inits that depend on non-traced hparams (e.g. the
    PS-VAE orthogonal heads drawn from ``rng_seed_model`` with numpy) are
    exact per trial. Returns (params_k, models) — all models must share
    one architecture (one program); the first is the step model.
    """
    stacked, models = [], []
    for t in trials:
        hp = dict(base_hparams, **t)
        model = make_model(hp)
        models.append(model)
        seed = int(hp.get('rng_seed_model', 0))
        stacked.append(model.init(jax.random.PRNGKey(seed)))
    sigs = {(jax.tree_util.tree_structure(p),
             tuple(jnp.shape(leaf) for leaf in jax.tree_util.tree_leaves(p)))
            for p in stacked}
    if len(sigs) != 1:
        raise ValueError(
            'vmap grid trials produced different param structures — trials '
            'may only differ in optimizer/seed/loss-kwarg hyperparameters')
    params_k = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *stacked)
    return params_k, models


def stack_loss_kwargs(models, trials, epoch):
    """Per-trial loss kwargs for ``epoch`` stacked into vector leaves.

    Starts from each model's own ``loss_kwargs(epoch)`` (anneal schedules
    honor each trial's hparams, which already include the trial overrides
    via :func:`init_trials`) and overlays trial keys that name an actual
    ``loss_fn`` keyword (e.g. ``{'alpha': 50.0}`` for the PS-VAE). Other
    trial keys (``'vae.beta'``-style hparams, optimizer/seed keys) are
    construction-time and handled elsewhere.
    """
    import inspect
    allowed = set(inspect.signature(models[0].loss_fn).parameters) - {
        'params', 'batch', 'rng', 'dataset', 'train', 'seg_lens'}
    per_trial = []
    for model, t in zip(models, trials):
        kw = dict(model.loss_kwargs(epoch)) if hasattr(model, 'loss_kwargs') else {}
        for key, val in t.items():
            if key in _OPT_KEYS or key in _SEED_KEYS or key not in allowed:
                continue
            kw[key] = jnp.float32(val)
        per_trial.append(kw)
    keys = {frozenset(kw) for kw in per_trial}
    if len(keys) != 1:
        raise ValueError('trials disagree on loss-kwarg names: %r' % (keys,))
    return {k: jnp.stack([kw[k] for kw in per_trial]) for k in per_trial[0]}


def default_grid_mesh(n_trials, hparams=None, axis_name='grid'):
    """The mesh :func:`fit_vmap_grid` shards grid trials over by default.

    The reference fans grid trials across local GPUs as one process per
    device (reference fitting/ae_grid_search.py:173-187 via test-tube's
    ``optimize_parallel_gpu``). The TPU-native equivalent is a 1-D mesh
    over the local chips with the *trial* axis of the grid-in-one-program
    step sharded across it (see :func:`make_vmap_grid_functions`); this
    helper builds that mesh. Returns ``None`` (single-device path) when
    only one device is visible, when there is nothing to shard, or when
    the compute config pins ``grid_devices`` to 0/1. ``grid_devices: n``
    caps the mesh at the first ``n`` local devices.
    """
    devices = jax.devices()
    n_dev = len(devices)
    if hparams is not None and hparams.get('grid_devices') is not None:
        n_dev = min(n_dev, int(hparams['grid_devices']))
    n_dev = min(n_dev, int(n_trials))
    if n_dev <= 1:
        return None
    return Mesh(np.asarray(devices[:n_dev]), (axis_name,))


def make_vmap_grid_functions(model, base_hparams, trials, mode='scan',
                             mesh=None):
    """Build (init_opt, train_step, eval_step) over a leading trial axis.

    - ``init_opt(params_k) -> opt_state_k`` (vmapped optax init)
    - ``train_step(params_k, opt_state_k, rngs_k, batch, loss_kwargs_k)
      -> (params_k, opt_state_k, metrics_k)`` — one optimizer step for
      every trial; ``batch`` is shared (no leading trial axis);
      ``loss_kwargs_k`` from :func:`stack_loss_kwargs`; metrics leaves get
      a leading trial axis.
    - ``eval_step(params_k, rngs_k, batch, loss_kwargs_k) -> metrics_k``

    ``mode``: ``'scan'`` (default) runs trials sequentially on device via
    ``lax.map`` — full per-trial step speed; ``'vmap'`` batches them into
    one grouped program — measured throughput-NEUTRAL on v5e (XLA lowers
    the trial axis of every conv as groups that scale linearly, 0.9-0.96x
    per trial; tools/bench_vmap_grid.py), kept for backends where grouped
    convs fuse better. Either way all k trials consume ONE host batch, so
    in input-bound regimes (slow storage, remote links, the 0.5 GB/s/chip
    SURVEY budget) grid throughput approaches k times the sequential loop.

    ``mesh``: a :class:`jax.sharding.Mesh` whose FIRST axis shards the
    trial axis — the multi-chip grid fan-out (the reference maps grid
    trials across local GPUs, ae_grid_search.py:173-187; here n chips each
    run ``k/n`` trials of the same program concurrently). Implemented as a
    ``shard_map`` manual over the first mesh axis with the per-shard body
    identical to the single-device path (``mode`` applies within each
    shard), so per-trial numerics match the unsharded step exactly — the
    trials are data-independent and no collectives are inserted. ``k``
    that doesn't divide the axis is padded inside the step by repeating
    the last trial's lanes (outputs sliced back; donation unaffected). Any
    FURTHER mesh axes stay *automatic* (GSPMD): pass a 2-D
    ``('grid', 'dp')`` mesh and a batch placed with
    ``NamedSharding(mesh, P('dp'))`` to additionally shard the shared
    batch's frame axis — XLA inserts the per-trial gradient all-reduce
    over 'dp' (tests/test_parallel/test_grid.py pins equivalence).
    """
    if mode not in ('scan', 'vmap'):
        raise ValueError("mode must be 'scan' or 'vmap', got %r" % (mode,))
    k = len(trials)
    lrs = jnp.asarray([float(dict(base_hparams, **t)['learning_rate'])
                       for t in trials], dtype=jnp.float32)
    wds = jnp.asarray([float(dict(base_hparams, **t).get('l2_reg', 0) or 0)
                       for t in trials], dtype=jnp.float32)
    use_wd = bool(np.any(np.asarray(wds) > 0))
    has_state = bool(getattr(model, 'has_state', False))

    if hasattr(model, 'trainable_mask'):
        base_mask_fn = model.trainable_mask
    else:
        def base_mask_fn(params):
            return jax.tree_util.tree_map(lambda _: True, params)

    def mask_fn(params):
        mask = base_mask_fn(params)

        def fix(path, m):
            last = path[-1]
            name = last.key if isinstance(last, jax.tree_util.DictKey) else None
            return False if name in _STATE_LEAVES else m
        return jax.tree_util.tree_map_with_path(fix, mask)

    def _tx(lr, wd):
        # optax transforms take traced scalars: lr/wd vary per vmap lane.
        # torch Adam weight_decay semantics as in make_train_functions
        chain = []
        if use_wd:
            chain.append(optax.add_decayed_weights(wd, mask=mask_fn))
        chain.append(optim.amsgrad(lr))
        return optax.chain(*chain)

    def one_train_step(params, opt_state, rng, batch, loss_kwargs, lr, wd,
                       seg_lens):
        extra = {'train': True} if has_state else {}
        if seg_lens is not None:
            extra['seg_lens'] = seg_lens

        def lf(p):
            return model.loss_fn(p, batch, rng, dataset=0, **extra, **loss_kwargs)
        (_, metrics), grads = jax.value_and_grad(lf, has_aux=True)(params)
        state = metrics.pop('_state', None)
        updates, opt_state = _tx(lr, wd).update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if state is not None:
            params = merge_state(params, state)
        return params, opt_state, metrics

    def one_eval_step(params, rng, batch, loss_kwargs, seg_lens):
        extra = {} if seg_lens is None else {'seg_lens': seg_lens}
        _, metrics = model.loss_fn(params, batch, rng, dataset=0, **extra,
                                   **loss_kwargs)
        return metrics

    def _fan(step1, arg_trees):
        """Apply the per-trial step over the leading trial axis (one shard)."""
        if mode == 'vmap':
            return jax.vmap(step1)(*arg_trees)
        # lax.map = scan over trials: one trial's program body compiled
        # once, batch captured as a shared constant
        return jax.lax.map(lambda xs: step1(*xs), arg_trees)

    if mesh is not None:
        grid_axis = mesh.axis_names[0]
        n_grid = mesh.shape[grid_axis]
        pad = (-k) % n_grid
        # further mesh axes (e.g. 'dp') stay automatic: GSPMD shards the
        # batch/activations inside each grid shard and inserts collectives
        manual = {grid_axis}

        def _pad_k(tree):
            if not pad:
                return tree
            return jax.tree_util.tree_map(
                lambda a: jnp.concatenate(
                    [a, jnp.broadcast_to(a[-1:], (pad,) + a.shape[1:])]), tree)

        def _unpad_k(tree):
            if not pad:
                return tree
            return jax.tree_util.tree_map(lambda a: a[:k], tree)

        def _shard_call(local, args, batch):
            def local_(*xs):
                # the shared batch enters replicated over the grid axis but
                # every per-trial gradient wrt it varies by lane (custom conv
                # VJPs produce {V:grid} cotangents): mark it varying up front
                # — a type-level broadcast, no communication
                xs, b = xs[:-1], xs[-1]
                b = jax.tree_util.tree_map(
                    lambda a: jax.lax.pcast(a, grid_axis, to='varying'), b)
                return local(*xs, b)
            sm = jax.shard_map(
                local_, mesh=mesh,
                in_specs=(P(grid_axis),) * len(args) + (P(),),
                out_specs=P(grid_axis), axis_names=manual)
            return _unpad_k(sm(*[_pad_k(a) for a in args], batch))

    # seg_lens is a static per-bucket tuple (jit static_argnames below), so
    # the per-mode fan-out closes over it alongside the shared batch
    def train_step(params_k, opt_state_k, rngs_k, batch, loss_kwargs_k,
                   seg_lens=None):
        batch = _normalize_images(batch)

        def step1(params, opt_state, rng, loss_kwargs, lr, wd, batch=None):
            return one_train_step(params, opt_state, rng, batch, loss_kwargs,
                                  lr, wd, seg_lens)
        args = (params_k, opt_state_k, rngs_k, loss_kwargs_k, lrs, wds)
        if mesh is not None:
            def local(params_k, opt_state_k, rngs_k, loss_kwargs_k,
                      lrs_l, wds_l, batch):
                return _fan(lambda p, o, r, lk, lr, wd: step1(
                    p, o, r, lk, lr, wd, batch),
                    (params_k, opt_state_k, rngs_k, loss_kwargs_k, lrs_l, wds_l))
            return _shard_call(local, args, batch)
        return _fan(lambda p, o, r, lk, lr, wd: step1(p, o, r, lk, lr, wd, batch),
                    args)

    def eval_step(params_k, rngs_k, batch, loss_kwargs_k, seg_lens=None):
        batch = _normalize_images(batch)

        def eval1(params, rng, loss_kwargs, batch):
            return one_eval_step(params, rng, batch, loss_kwargs, seg_lens)
        args = (params_k, rngs_k, loss_kwargs_k)
        if mesh is not None:
            def local(params_k, rngs_k, loss_kwargs_k, batch):
                return _fan(lambda p, r, lk: eval1(p, r, lk, batch),
                            (params_k, rngs_k, loss_kwargs_k))
            return _shard_call(local, args, batch)
        return _fan(lambda p, r, lk: eval1(p, r, lk, batch), args)

    def init_opt(params_k):
        return jax.vmap(lambda p, lr, wd: _tx(lr, wd).init(p))(params_k, lrs, wds)

    train_step = jax.jit(train_step, static_argnames=('seg_lens',),
                         donate_argnums=(0, 1))
    eval_step = jax.jit(eval_step, static_argnames=('seg_lens',))
    return init_opt, train_step, eval_step


def group_vmappable(trials, max_k):
    """Partition full-hparams grid trials into vmappable groups + singles.

    Trials group when the ONLY keys whose values differ across them are in
    the class whitelist (optimizer scalars, seeds, loss-weight schedules) —
    anything else (architecture, data config, training config) changes the
    compiled program or the data stream and falls back to the sequential
    loop. Returns (groups, singles) preserving trial order inside each.
    """
    if len(trials) < 2 or max_k < 2:
        return [], list(trials)
    cls = trials[0].get('model_class')
    allowed = _VMAPPABLE_BY_CLASS.get(cls)
    if allowed is None:
        return [], list(trials)
    allowed = allowed | set(_OPT_KEYS) | set(_GROUPABLE_SEED_KEYS)

    keys = set().union(*(set(t) for t in trials))
    varying = set()
    for key in keys:
        vals = {repr(t.get(key)) for t in trials}
        if len(vals) > 1:
            varying.add(key)
    if not varying <= allowed:
        print('vmap_trials: sequential fallback — non-vmappable keys vary '
              'across trials: %s' % sorted(varying - allowed))
        return [], list(trials)
    groups = [list(trials[i:i + max_k]) for i in range(0, len(trials), max_k)]
    singles = [g[0] for g in groups if len(g) == 1]
    groups = [g for g in groups if len(g) > 1]
    return groups, singles


def group_resume_versions(expt_dir, version0, n_trials):
    """Per-trial version numbers for resuming a grouped grid fit.

    Grid trials of one model class share one ``expt_dir`` and were
    allocated k DIFFERENT version dirs on the original run, but the CLI's
    ``resume_version`` is a single int — reopening it for every trial
    would clobber one version dir with all k trials' outputs. The group
    checkpoint (``last_checkpoint_group.pkl``, written in the FIRST
    trial's version dir) records each trial's version-dir basename in its
    grouping signature; this reads them back so :func:`main_group` callers
    can reopen each trial's own version. ``version0`` is the CLI's
    ``resume_version`` (= the first trial's version). Raises with an
    actionable message when the checkpoint is missing or the grid was
    regrouped (the group is the resume unit).
    """
    import pickle
    ckpt_file = os.path.join(expt_dir, 'version_%i' % int(version0),
                             'last_checkpoint_group.pkl')
    if not os.path.exists(ckpt_file):
        raise FileNotFoundError(
            'cannot resume grouped grid fit: no group checkpoint at %s '
            '(resume_version must name the FIRST trial of the interrupted '
            'group; single trials resume via the sequential path)' % ckpt_file)
    with open(ckpt_file, 'rb') as f:
        sig = pickle.load(f).get('group_sig') or []
    if len(sig) != n_trials:
        raise ValueError(
            'cannot resume grouped grid fit: checkpoint at %s groups %i '
            'trial(s) but the current grid groups %i — the group is the '
            'resume unit, so the grid config must not be regrouped between '
            'interrupt and resume' % (ckpt_file, len(sig), n_trials))
    versions = [int(basename.rsplit('_', 1)[1]) for basename, _ in sig]
    if versions[0] != int(version0):
        raise ValueError(
            'group checkpoint at %s records version_%i as its first trial, '
            'not resume_version %i' % (ckpt_file, versions[0], int(version0)))
    return versions


def fit_vmap_grid(hparams_list, models, data_generator, exps, method='ae',
                  warm_fn=None, mode='scan', mesh='auto'):
    """Fit k grid trials in one program over a shared data stream.

    Mirrors :func:`behavenet_tpu.fitting.training.fit` semantics per trial
    (epoch-0 eval, fractional val checks, per-trial best-val checkpointing
    and metrics.csv rows, per-trial test rows and exports), with every
    trial consuming the SAME batch sequence — the point: one disk -> host
    -> device stream feeds k optimizer steps, so input-bound grids run ~k
    times faster than the sequential trial loop. Multisession ``seg_lens``
    batches (MSPS-VAE) work: the static segment lengths select the compiled
    program per bucket combination, as in the sequential trainer. Mid-run
    resume works group-wise (``last_checkpoint_group.pkl`` in the first
    trial's version dir: the trials share one stream and one program, so
    the group restarts as a unit). Through the CLI, ``resume_version``
    names the FIRST trial's version; :func:`group_resume_versions` maps
    the remaining trials back to their own version dirs (``main_group``
    does this before building ``exps``). Not supported here (use the
    sequential path): ``steps_per_dispatch`` (the trial scan already
    amortizes dispatch), tp sharding.

    ``mesh='auto'`` (default) shards the trial axis over all local devices
    whenever more than one is visible (:func:`default_grid_mesh`; cap or
    disable with ``grid_devices`` in the compute config) — the TPU-native
    equivalent of the reference mapping grid trials across local GPUs
    (reference fitting/ae_grid_search.py:173-187). Pass an explicit mesh
    (first axis = trial axis) or ``None`` (single-device) to override.

    Returns the list of per-trial best params.
    """
    from behavenet_tpu.data.prefetch import prefetched
    from behavenet_tpu.fitting.training import (
        EarlyStopping, Logger, _collate)
    from behavenet_tpu.models import base as models_base

    hp0 = hparams_list[0]
    k = len(models)
    model_class = hp0['model_class']
    trials = [{key: h.get(key) for key in _OPT_KEYS + _SEED_KEYS}
              for h in hparams_list]
    if isinstance(mesh, str) and mesh == 'auto':
        mesh = default_grid_mesh(k, hp0)
    if mesh is not None:
        print('vmap_trials: sharding %i trials over %i devices (mesh %r)'
              % (k, mesh.shape[mesh.axis_names[0]], tuple(mesh.axis_names)))

    # per-trial init (+ optional warm start), stacked along the trial axis
    stacked = []
    for model, hp in zip(models, hparams_list):
        p = model.init(jax.random.PRNGKey(int(hp.get('rng_seed_model', 0))))
        if warm_fn is not None:
            p = warm_fn(p, model, hp)
        stacked.append(p)
    params_k = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *stacked)

    init_opt, train_step, eval_step = make_vmap_grid_functions(
        models[0], hp0, trials, mode=mode, mesh=mesh)
    opt_state_k = init_opt(params_k)

    loggers = [Logger(n_datasets=data_generator.n_datasets) for _ in range(k)]
    if hp0['enable_early_stop']:
        stops = [EarlyStopping(patience=hp0['early_stop_history'],
                               min_epochs=hp0['min_n_epochs']) for _ in range(k)]
    else:
        stops = None

    best_val_loss = [np.inf] * k
    best_val_epoch = [None] * k
    best_params = [None] * k
    best_saved = [False] * k
    val_check_batch = np.append(
        hp0['val_check_interval'] * data_generator.n_tot_batches['train'] *
        np.arange(1, int((hp0['max_n_epochs'] + 1) / hp0['val_check_interval'])),
        [data_generator.n_tot_batches['train'] * hp0['max_n_epochs'],
         data_generator.n_tot_batches['train'] * (hp0['max_n_epochs'] + 1)]).astype('int')

    # one batching order for the whole group (the stream is shared); step
    # rng streams are per-trial so stochastic losses stay independent
    rng_train = int(hp0['rng_seed_train']) if hp0.get('rng_seed_train') is not None \
        else np.random.randint(0, 10000)
    keys = jnp.stack([jax.random.PRNGKey(
        (rng_train if h.get('rng_seed_train') is None
         else int(h['rng_seed_train'])) + 7919 * i)
        for i, h in enumerate(hparams_list)])

    expt_dirs = [os.path.join(h['expt_dir'], 'version_%i' % e.version)
                 for h, e in zip(hparams_list, exps)]

    def save_trial(i, label='best_val_model.pt'):
        p = jax.tree_util.tree_map(lambda x: jnp.asarray(np.asarray(x)[i]), params_k)
        models_base.save_params(p, os.path.join(expt_dirs[i], label),
                                extra={'model_class': model_class})
        return p

    def split_keys():
        nonlocal keys
        keys, subs = jnp.split(jax.vmap(jax.random.split, out_axes=1)(keys), 2)
        return keys[0], subs[0]

    # mid-run group resume (mirrors training.fit's last_checkpoint.pkl, the
    # reference's acknowledged TODO training.py:9): the trials share one
    # data stream and one compiled program, so the WHOLE group restarts as
    # a unit — the checkpoint lives in the first trial's version dir and
    # carries a grouping signature that must match on restart (a changed
    # grid regroups differently; a stale checkpoint is then ignored).
    import pickle as _pickle
    # the signature also covers the class's vmappable loss-weight hparams
    # (e.g. ps_vae.alpha) — trials may differ ONLY in those, and a config
    # edited between interrupt and resume must not silently continue
    extra_keys = sorted(_VMAPPABLE_BY_CLASS.get(model_class) or ())
    group_sig = [(os.path.basename(d),
                  dict(t, **{key: h.get(key) for key in extra_keys}))
                 for d, t, h in zip(expt_dirs, trials, hparams_list)]
    ckpt_file = os.path.join(expt_dirs[0], 'last_checkpoint_group.pkl')
    start_epoch = 0
    if hp0.get('resume_version') is not None and os.path.exists(ckpt_file):
        with open(ckpt_file, 'rb') as f:
            ckpt = _pickle.load(f)
        if ckpt.get('group_sig') != group_sig:
            print('vmap_trials: group checkpoint signature mismatch, '
                  'starting fresh')
        else:
            params_k = jax.tree_util.tree_map(jnp.asarray, ckpt['params_k'])
            opt_state_k = jax.tree_util.tree_map(
                lambda x: jnp.asarray(x) if isinstance(x, np.ndarray) else x,
                ckpt['opt_state_k'])
            keys = jnp.asarray(ckpt['keys'])
            rng_train = ckpt.get('rng_train', rng_train)
            best_val_loss = ckpt['best_val_loss']
            best_val_epoch = ckpt['best_val_epoch']
            best_saved = ckpt['best_saved']
            for i in range(k):
                bf = os.path.join(expt_dirs[i], 'best_val_model.pt')
                if best_saved[i] and os.path.exists(bf):
                    best_params[i], _ = models_base.load_params(bf)
                else:
                    best_saved[i] = False
            start_epoch = ckpt['epoch'] + 1
            print('vmap_trials: resuming group from epoch %i' % start_epoch)

    # if the resumed group is already complete the epoch loop body never
    # runs: i_epoch must then be the final epoch so the closing test pass
    # evaluates with the final (not epoch-0) loss-kwarg schedules
    i_epoch = max(0, start_epoch - 1)
    for i_epoch in range(start_epoch, hp0['max_n_epochs'] + 1):
        np.random.seed(rng_train + i_epoch)
        for lg in loggers:
            lg.reset_metrics('train')
        data_generator.reset_iterators('train')
        lk = stack_loss_kwargs(models, trials, i_epoch)

        import time as _time
        t_epoch = _time.perf_counter()
        n_frames_epoch = 0
        pf_workers = int(hp0.get('prefetch_workers', 1))
        pf_stage = None
        if pf_workers > 1:
            def pf_stage(item):
                data_s, dataset_s = item
                if data_s is None:
                    return data_s, dataset_s, None
                pre = _collate(data_s, dataset_s, model_class, hp0)
                return data_s, dataset_s, (jax.device_put(pre[0]),) + pre[1:]
        train_iter = prefetched(
            lambda: data_generator.next_batch('train'),
            data_generator.n_tot_batches['train'],
            depth=int(hp0.get('prefetch_depth', 2)),
            stage_fn=pf_stage, workers=pf_workers)

        for i_train, item in enumerate(train_iter):
            data, dataset = item[0], item[1]
            pre = item[2] if len(item) > 2 else None
            will_log = (i_train + 1) % data_generator.n_tot_batches['train'] == 0
            will_val = np.any(
                (i_train + 1) + i_epoch * data_generator.n_tot_batches['train']
                == val_check_batch)
            if data is not None:
                batch, ds, seg_lens, _ = pre if pre is not None else \
                    _collate(data, dataset, model_class, hp0)
                keys, subs = split_keys()
                if i_epoch > 0:
                    params_k, opt_state_k, metrics = train_step(
                        params_k, opt_state_k, subs, batch, lk,
                        seg_lens=seg_lens)
                else:
                    metrics = eval_step(params_k, subs, batch, lk,
                                        seg_lens=seg_lens)
                metrics = {key: np.asarray(v) for key, v in metrics.items()}
                for i, lg in enumerate(loggers):
                    lg.update_metrics(
                        'train', {key: v[i] for key, v in metrics.items()},
                        dataset=0 if isinstance(ds, list) else ds)
                first = next(iter(batch.values()))
                n_frames_epoch += int(first.shape[0])

            if will_log:
                for i, (lg, exp) in enumerate(zip(loggers, exps)):
                    exp.log(lg.create_metric_row(
                        'train', i_epoch, i_train, -1, trial=-1,
                        by_dataset=False, best_epoch=best_val_epoch[i]))
                    exp.save()

            if will_val:
                for lg in loggers:
                    lg.reset_metrics('val')
                data_generator.reset_iterators('val')
                for _ in range(data_generator.n_tot_batches['val']):
                    data_v, d_val = data_generator.next_batch('val')
                    batch, ds, seg_lens, _ = _collate(data_v, d_val, model_class, hp0)
                    keys, subs = split_keys()
                    metrics = eval_step(params_k, subs, batch, lk,
                                        seg_lens=seg_lens)
                    metrics = {key: np.asarray(v) for key, v in metrics.items()}
                    for i, lg in enumerate(loggers):
                        lg.update_metrics(
                            'val', {key: v[i] for key, v in metrics.items()},
                            dataset=0 if isinstance(ds, list) else ds)
                for i, (lg, exp) in enumerate(zip(loggers, exps)):
                    if lg.get_loss('val') < best_val_loss[i]:
                        best_val_loss[i] = lg.get_loss('val')
                        best_params[i] = save_trial(i)
                        best_saved[i] = True
                        best_val_epoch[i] = i_epoch
                    exp.log(lg.create_metric_row(
                        'val', i_epoch, i_train, -1, trial=-1,
                        by_dataset=False, best_epoch=best_val_epoch[i]))
                    exp.save()

        dt = _time.perf_counter() - t_epoch
        if i_epoch > 0 and dt > 0:
            print('epoch %03i/%03i: %.2fs, %.0f frames/sec through %i trials'
                  % (i_epoch, hp0['max_n_epochs'], dt, n_frames_epoch / dt, k))

        # full-state group checkpoint for exact mid-run resume
        if hp0.get('checkpoint_interval', 1):
            if i_epoch % int(hp0.get('checkpoint_interval', 1)) == 0:
                with open(ckpt_file, 'wb') as f:
                    _pickle.dump({
                        'group_sig': group_sig,
                        'params_k': jax.tree_util.tree_map(np.asarray, params_k),
                        'opt_state_k': jax.tree_util.tree_map(
                            lambda x: np.asarray(x) if hasattr(x, 'shape') else x,
                            opt_state_k),
                        'keys': np.asarray(keys),
                        'rng_train': rng_train,
                        'epoch': i_epoch,
                        'best_val_loss': best_val_loss,
                        'best_val_epoch': best_val_epoch,
                        'best_saved': best_saved,
                    }, f)

        if stops is not None:
            for i, (st, lg) in enumerate(zip(stops, loggers)):
                st.on_val_check(i_epoch, lg.get_loss('val'))
            if all(st.should_stop for st in stops):
                break

    for i in range(k):
        if not best_saved[i]:
            best_params[i] = save_trial(i)
    if hp0.get('save_last_model', False):
        for i in range(k):
            save_trial(i, label='last_model.pt')

    # per-trial test rows with each trial's best params (reference :435-447)
    lk_test = stack_loss_kwargs(models, trials, i_epoch)
    best_k = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *best_params)
    data_generator.reset_iterators('test')
    for i_test in range(data_generator.n_tot_batches['test']):
        data, dataset = data_generator.next_batch('test')
        batch, ds, seg_lens, trial = _collate(data, dataset, model_class, hp0)
        keys, subs = split_keys()
        metrics = eval_step(best_k, subs, batch, lk_test, seg_lens=seg_lens)
        metrics = {key: np.asarray(v) for key, v in metrics.items()}
        ds_idx = 0 if isinstance(ds, list) else ds
        for i, (lg, exp) in enumerate(zip(loggers, exps)):
            lg.reset_metrics('test')
            lg.update_metrics('test', {key: v[i] for key, v in metrics.items()},
                              dataset=ds_idx)
            exp.log(lg.create_metric_row(
                'test', i_epoch, i_test, ds_idx, trial=trial, by_dataset=True))
    for exp in exps:
        exp.save()

    if method == 'ae' and hp0.get('export_latents', False):
        from behavenet_tpu.fitting.eval import export_latents
        for i, (model, hp, exp) in enumerate(zip(models, hparams_list, exps)):
            print('exporting latents (trial %i)' % i)
            export_latents(data_generator, model, best_params[i],
                           version=exp.version, expt_dir=hp['expt_dir'])

    return best_params
