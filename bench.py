"""Benchmark: the three BASELINE metrics on real hardware, one JSON line.

Stages (each independently guarded against transient tunnel errors):

1. **Compute throughput** — conv-AE train step (fwd+bwd+Adam fused) on
   device-resident 128x128 uint8 batches. The headline is the reference's
   published workload: the 2-view Musall dataset at 189-frame trial
   batches (reference examples/01_ae.ipynb:21, shape (189, 2, 128, 128));
   the 1-view batch-1024 point is the per-chip ceiling. Every stage
   reports MFU from the analytic FLOP model in ``utils/flops.py`` against
   bf16 peak (v5e 197 TF default; override via BENCH_PEAK_TFLOPS).
2. **Streamed training throughput** — a real multi-trial HDF5 session on
   disk streamed through ``ConcatSessionsGenerator`` + the async prefetch
   pipeline into the same jitted step: epoch frames/sec with the
   disk -> collate -> host->device path inside the timed region (SURVEY
   hard-part 4: >= 0.5 GB/s/chip of uint8 input). The host-side staging
   rate (HDF5 read + collation only) is reported alongside so a slow
   host->device tunnel can be distinguished from a slow input pipeline.
3. **ARHMM EM rate** — EM iters/sec, K=16 / D=9 / AR(1), 100 x 1000-frame
   trials (the reference's ssm fit is CPU-bound; BASELINE tracks iters/sec).
4. **Torch training parity** — tools/parity_check.py in a CPU subprocess
   (200 lockstep steps vs an equivalent torch AE): converged-regime mean
   relative MSE gap, BASELINE target < 1%.

Baseline target: >= 30,000 frames/sec/chip (BASELINE.md). The reference
takes ">12 hours" per model on the example dataset on one GPU
(examples/01_ae.ipynb).

Measurement notes: through the axon remote-execution tunnel,
``block_until_ready`` does not reliably synchronize, so timing uses a host
fetch of the final loss after a deep queue of steps. Details go to stderr;
stdout carries exactly one JSON line.
"""

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

import numpy as np

TARGET_FPS = 30000.0


def _ae_hparams(img=(1, 128, 128), compute_dtype='bfloat16', **extra):
    import jax.numpy as jnp
    from behavenet_tpu.models.arch import load_handcrafted_arch
    arch = load_handcrafted_arch(list(img), 12, None, check_memory=False)
    return dict(
        arch, model_class='ae', model_type='conv', n_ae_latents=12,
        n_input_channels=img[0], y_pixels=img[1], x_pixels=img[2],
        learning_rate=1e-4, l2_reg=0.0, rng_seed_model=0,
        compute_dtype=jnp.bfloat16 if compute_dtype == 'bfloat16' else None,
        # bf16 end-to-end activation chain: ~2% on top of bf16 compute
        bf16_pipeline=compute_dtype == 'bfloat16', **extra)


def measure(batch, n_steps=50, n_repeats=3, steps_per_dispatch=1,
            img=(1, 128, 128), compute_dtype='bfloat16'):
    """Device-resident train-step throughput (compute upper bound)."""
    import jax
    import jax.numpy as jnp

    from behavenet_tpu.fitting.training import make_multi_step, make_train_functions
    from behavenet_tpu.models import AE

    hp = _ae_hparams(img=img, compute_dtype=compute_dtype)
    model = AE(hp)
    tx, train_step, _ = make_train_functions(model, hp)
    params = model.init(jax.random.PRNGKey(0))
    opt_state = tx.init(params)
    rng = jax.random.PRNGKey(1)
    x = jnp.asarray(
        np.random.RandomState(0).randint(0, 255, size=(batch, hp['y_pixels'],
                                                       hp['x_pixels'], img[0])),
        dtype=jnp.uint8)
    b = {'images': x}

    spd = int(steps_per_dispatch)
    if spd > 1:
        # k optimizer steps per dispatch (fit(steps_per_dispatch=k) path):
        # amortizes per-dispatch host/RPC overhead at small trial shapes
        multi = make_multi_step(model, hp, tx)
        bs = {'images': jnp.tile(x[None], (spd, 1, 1, 1, 1))}
        rngs = jax.random.split(rng, spd)
        n_steps = -(-n_steps // spd)

        def train_step(params, opt_state, rng, b, lk, ds, sl):  # noqa: F811
            p, o, ms = multi(params, opt_state, rngs, bs, lk, ds)
            return p, o, {'loss': ms['loss'][-1]}

    # compile + warm sync (host fetch forces full execution)
    t0 = time.perf_counter()
    params, opt_state, m = train_step(params, opt_state, rng, b, {}, 0, None)
    _ = float(m['loss'])
    print('img=%s batch=%d spd=%d dtype=%s compile+first step: %.0fs'
          % ('x'.join(map(str, img)), batch, spd, compute_dtype,
             time.perf_counter() - t0), file=sys.stderr)
    params, opt_state, m = train_step(params, opt_state, rng, b, {}, 0, None)
    _ = float(m['loss'])

    # best-of-n repeats: timing through the remote tunnel is sensitive to
    # transient host/tunnel contention, and training throughput is a
    # best-sustained-rate quantity
    best = 0.0
    for rep in range(n_repeats):
        t0 = time.perf_counter()
        for _ in range(n_steps):
            params, opt_state, m = train_step(params, opt_state, rng, b, {}, 0, None)
        final_loss = float(m['loss'])  # host fetch = true sync
        dt = time.perf_counter() - t0
        fps = n_steps * spd * batch / dt
        print('img=%s batch=%d spd=%d dtype=%s rep=%d: %.0f frames/s (%.2f ms/step, final loss %.5f)' % (
            'x'.join(map(str, img)), batch, spd, compute_dtype, rep, fps,
            dt / (n_steps * spd) * 1e3, final_loss), file=sys.stderr)
        assert np.isfinite(final_loss)
        best = max(best, fps)
    return best


def measure_streamed(T=189, n_trials=50, n_epochs=3, hw=128, n_views=2,
                     prefetch_workers=4, prefetch_depth=4):
    """End-to-end epoch throughput streaming real trials from an HDF5 on disk.

    Exercises the actual training input path (reference hot path
    data_generator.py:551-633) at the HEADLINE shape — 2-view Musall
    (189, 2, 128, 128) uint8 trials (VERDICT r4 item 5): lazy per-trial
    HDF5 reads through the native fused read+NCHW->NHWC staging kernel
    (data/raw_h5.read_nhwc -> _native/staging.cpp) -> collation/bucketing
    -> parallel-staged host->device upload (prefetch pipeline) -> jitted
    train step. Returns (epoch_frames_per_sec, host_staging_gb_per_sec,
    train_frames_per_epoch, native_staging_used).
    """
    import h5py
    import jax

    from behavenet_tpu.data.generator import ConcatSessionsGenerator
    from behavenet_tpu.data.prefetch import prefetched
    from behavenet_tpu.fitting.training import _collate, make_train_functions
    from behavenet_tpu.models import AE

    tmpdir = tempfile.mkdtemp(prefix='bench_stream_')
    try:
        sess_dir = os.path.join(tmpdir, 'lab', 'expt', 'animal', 'session')
        os.makedirs(sess_dir)
        h5_path = os.path.join(sess_dir, 'data.hdf5')
        rs = np.random.RandomState(0)
        with h5py.File(h5_path, 'w', libver='latest') as f:
            g = f.create_group('images')
            for i in range(n_trials):
                g.create_dataset(
                    'trial_%04i' % i,
                    data=rs.randint(0, 255, size=(T, n_views, hw, hw)),
                    dtype='uint8')
        gb_written = n_trials * T * n_views * hw * hw / 1e9
        print('streamed: wrote %d trials x %d %d-view frames (%.2f GB) to %s'
              % (n_trials, T, n_views, gb_written, h5_path), file=sys.stderr)

        # is the native fused staging kernel live for this read path?
        from behavenet_tpu import _native
        native_used = (_native.get_lib() is not None
                       and not os.environ.get('BEHAVENET_NO_NATIVE'))

        ids = {'lab': 'lab', 'expt': 'expt', 'animal': 'animal', 'session': 'session'}
        dg = ConcatSessionsGenerator(
            tmpdir, [ids], signals_list=[['images']], transforms_list=[[None]],
            paths_list=[[h5_path]], rng_seed=0)
        n_train = dg.n_tot_batches['train']
        frames_per_epoch = n_train * T

        hp = _ae_hparams(img=(n_views, hw, hw), shape_bucket=32)
        model = AE(hp)
        tx, train_step, _ = make_train_functions(model, hp)
        params = model.init(jax.random.PRNGKey(0))
        opt_state = tx.init(params)

        # host-side staging rate alone (HDF5 read + collate, no device):
        # one warm-cache pass, then the timed pass (steady-state epochs run
        # against a warm page cache)
        for timed in (False, True):
            dg.reset_iterators('train')
            t0 = time.perf_counter()
            nbytes = 0
            for _ in range(n_train):
                data, ds = dg.next_batch('train')
                batch, _, _, _ = _collate(data, ds, 'ae', hp)
                nbytes += batch['images'].nbytes
            host_gbps = nbytes / (time.perf_counter() - t0) / 1e9
        print('streamed: host staging (HDF5+collate) alone: %.2f GB/s'
              % host_gbps, file=sys.stderr)

        def run_epoch(keys):
            nonlocal params, opt_state
            dg.reset_iterators('train')

            def pf_stage(item):
                data_s, ds_s = item
                pre = _collate(data_s, ds_s, 'ae', hp)
                return (jax.device_put(pre[0]),) + pre[1:]

            it = prefetched(lambda: dg.next_batch('train'), n_train,
                            depth=prefetch_depth, stage_fn=pf_stage,
                            workers=prefetch_workers)
            m = None
            for i, (batch, ds, _, _) in enumerate(it):
                params, opt_state, m = train_step(
                    params, opt_state, keys[i], batch, {}, ds, None)
            return m

        all_keys = jax.random.split(jax.random.PRNGKey(7), (n_epochs + 1) * n_train)
        t0 = time.perf_counter()
        m = run_epoch(all_keys[:n_train])
        _ = float(m['loss'])
        print('streamed: compile + first epoch: %.0fs'
              % (time.perf_counter() - t0), file=sys.stderr)

        best = 0.0
        for ep in range(n_epochs):
            keys = all_keys[(ep + 1) * n_train:(ep + 2) * n_train]
            t0 = time.perf_counter()
            m = run_epoch(keys)
            final_loss = float(m['loss'])  # host fetch = true sync
            dt = time.perf_counter() - t0
            fps = frames_per_epoch / dt
            print('streamed epoch %d: %.0f frames/s (%.1fs/epoch, loss %.5f)'
                  % (ep, fps, dt, final_loss), file=sys.stderr)
            assert np.isfinite(final_loss)
            best = max(best, fps)
        return best, host_gbps, frames_per_epoch, native_used
    finally:
        shutil.rmtree(tmpdir, ignore_errors=True)


def measure_staging_2view(T=189, n_trials=15, hw=128, n_passes=3):
    """Host staging rate at the reference's 2-view Musall shape (GB/s).

    (T, 2, hw, hw) uint8 trials on disk -> NHWC host arrays through
    ``SingleSessionDataset``. This is the shape where numpy's 2-channel
    uint8 transpose collapses to ~0.15 GB/s; the native fused
    read+transpose kernel (`_native/staging.cpp`, reached via
    ``data/raw_h5.read_nhwc``) does the interleave during the copy out of
    the page cache (>10x). Returns (native_gbps, fallback_gbps).
    """
    import h5py

    from behavenet_tpu.data.generator import SingleSessionDataset

    tmpdir = tempfile.mkdtemp(prefix='bench_2view_')
    try:
        sess_dir = os.path.join(tmpdir, 'lab', 'expt', 'animal', 'session')
        os.makedirs(sess_dir)
        h5_path = os.path.join(sess_dir, 'data.hdf5')
        rs = np.random.RandomState(0)
        with h5py.File(h5_path, 'w', libver='latest') as f:
            g = f.create_group('images')
            for i in range(n_trials):
                g.create_dataset(
                    'trial_%04i' % i,
                    data=rs.randint(0, 255, size=(T, 2, hw, hw)), dtype='uint8')
        ds = SingleSessionDataset(
            tmpdir, lab='lab', expt='expt', animal='animal', session='session',
            signals=['images'], transforms=[None], paths=[h5_path],
            batch_load=True)

        def rate(native):
            prior = os.environ.get('BEHAVENET_NO_NATIVE')  # restore, don't pop:
            if not native:                                 # the user may have
                os.environ['BEHAVENET_NO_NATIVE'] = '1'    # set the kill switch
            try:
                for i in range(n_trials):  # warm page cache + reader index
                    ds[i]
                best = 0.0
                for _ in range(n_passes):
                    t0 = time.perf_counter()
                    nbytes = 0
                    for i in range(n_trials):
                        nbytes += ds[i]['images'].nbytes
                    best = max(best, nbytes / (time.perf_counter() - t0) / 1e9)
                return best
            finally:
                if prior is None:
                    os.environ.pop('BEHAVENET_NO_NATIVE', None)
                else:
                    os.environ['BEHAVENET_NO_NATIVE'] = prior

        from behavenet_tpu import _native
        native_gbps = rate(native=True) if _native.get_lib() else None
        fallback_gbps = rate(native=False)
        print('2-view staging: native %s GB/s, python fallback %.2f GB/s'
              % ('%.2f' % native_gbps if native_gbps else 'n/a', fallback_gbps),
              file=sys.stderr)
        return native_gbps, fallback_gbps
    finally:
        shutil.rmtree(tmpdir, ignore_errors=True)


def measure_arhmm_em(K=16, D=9, n_trials=100, T=1000, n_iters=20, n_repeats=3):
    """EM iterations/sec on device (BASELINE metric 'ARHMM EM iters/sec').

    Returns a self-diagnosing dict (VERDICT r4 item 7): the best rate plus
    the per-rep rates for the per-dispatch and fused paths separately, so a
    round-over-round move is attributable to tunnel variance (wide per-rep
    spread) vs a real regression (tight spread at a lower level).
    """
    import jax

    from behavenet_tpu.models.arhmm import ARHMM, _pad_datas

    rs = np.random.RandomState(0)
    # smooth AR-like latents so the E-step sees realistic posteriors
    datas = [np.cumsum(rs.randn(T, D).astype('float32') * 0.1, axis=0)
             for _ in range(n_trials)]
    model = ARHMM(K, D, lags=1, observations='ar', transitions='stationary')
    model.initialize(datas)
    x, mask = _pad_datas(datas, model.np_dtype)
    step = jax.jit(model._em_step)
    params = model.params
    t0 = time.perf_counter()
    params, ll = step(params, x, mask)
    _ = float(ll)
    print('arhmm: compile + first EM iter: %.0fs'
          % (time.perf_counter() - t0), file=sys.stderr)

    reps = []
    for rep in range(n_repeats):
        t0 = time.perf_counter()
        for _ in range(n_iters):
            params, ll = step(params, x, mask)
        final_ll = float(ll)  # host fetch = true sync
        dt = time.perf_counter() - t0
        ips = n_iters / dt
        print('arhmm rep=%d: %.1f EM iters/s (ll %.1f)'
              % (rep, ips, final_ll), file=sys.stderr)
        assert np.isfinite(final_ll)
        reps.append(round(ips, 2))

    # fused dispatch: all n_iters iterations scanned inside ONE device
    # program (the fit(iters_per_dispatch=k) path) — amortizes per-dispatch
    # overhead that the loop above pays once per iteration
    fused = jax.jit(lambda p: jax.lax.scan(
        lambda q, _: model._em_step(q, x, mask), p, None, length=n_iters))
    t0 = time.perf_counter()
    params_f, lls_f = fused(model.params)
    _ = float(lls_f[-1])
    print('arhmm fused: compile + first %d-iter program: %.0fs'
          % (n_iters, time.perf_counter() - t0), file=sys.stderr)
    fused_reps = []
    for rep in range(n_repeats):
        t0 = time.perf_counter()
        params_f, lls_f = fused(model.params)
        final_ll = float(lls_f[-1])
        dt = time.perf_counter() - t0
        ips = n_iters / dt
        print('arhmm fused rep=%d: %.1f EM iters/s (ll %.1f)'
              % (rep, ips, final_ll), file=sys.stderr)
        assert np.isfinite(final_ll)
        fused_reps.append(round(ips, 2))
    return {'best': max(reps + fused_reps),
            'per_dispatch_reps': reps, 'fused_reps': fused_reps,
            'n_iters_per_rep': n_iters,
            'workload': 'K=%d D=%d %dx%d-frame trials' % (K, D, n_trials, T)}


def measure_parity(timeout_s=3600):
    """Torch lockstep training parity (full matrix: ae / vae / btcvae /
    condae / condvae / aemsp / psvae / mspsvae / decoder / convdecoder)
    in a CPU subprocess.

    Returns a dict of converged-regime relative gaps in %, one per model,
    plus 'worst' (the max; BASELINE target < 1%). ``timeout_s`` bounds the
    subprocess so a slow (few-core) host can't stall the JSON line.
    """
    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    env['PALLAS_AXON_POOL_IPS'] = ''
    out = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                      'tools', 'parity_check.py'), '--json'],
        env=env, capture_output=True, text=True, timeout=timeout_s)
    print(out.stdout, file=sys.stderr)
    if out.returncode not in (0, 1):
        raise RuntimeError('parity_check failed: %s' % out.stderr[-2000:])
    for line in reversed(out.stdout.strip().splitlines()):
        if line.startswith('{'):
            d = json.loads(line)
            gaps = {k: round(v, 5) for k, v in d.items() if k != 'converged_rel_gap_pct'}
            gaps['worst'] = round(d['converged_rel_gap_pct'], 5)
            return gaps
    raise RuntimeError('no JSON line from parity_check')


def main():
    # total wall budget: cold tunnel compiles dominate (~3-7 min per new
    # graph); later stages are skipped rather than risk the whole run being
    # killed before the JSON line is printed. Reference numbers measured on
    # v5e this round: streamed host-staging 0.8-1.9 GB/s, EM 167.7 iters/s,
    # parity gap 0.00063%.
    budget = float(os.environ.get('BENCH_BUDGET_S', 2700))
    t_start = time.time()

    def elapsed():
        return time.time() - t_start

    from behavenet_tpu.models.arch import load_handcrafted_arch
    from behavenet_tpu.utils.flops import (
        V5E_BF16_PEAK, ae_train_flops_per_frame, mfu)

    peak = float(os.environ.get('BENCH_PEAK_TFLOPS', V5E_BF16_PEAK / 1e12)) * 1e12
    tf_per_frame = {
        c: ae_train_flops_per_frame(
            load_handcrafted_arch([c, 128, 128], 12, None, check_memory=False))
        for c in (1, 2)}

    # 1. compute throughput. The headline is the reference's published
    # workload: the 2-view Musall dataset at 189-frame trial batches
    # (reference examples/01_ae.ipynb:21, batch shape (189, 2, 128, 128)),
    # reported per spd and per dtype (VERDICT r4 items 1-2/6: the spd=8
    # point is the fit(steps_per_dispatch=8) configuration; the f32 point
    # is the shipped default dtype). The 1-view batch-1024 point is the
    # per-chip ceiling.
    configs = ((2, 189, 1, 'bfloat16'), (2, 189, 8, 'bfloat16'),
               (2, 189, 1, 'float32'), (2, 1024, 1, 'bfloat16'),
               (1, 1024, 1, 'bfloat16'), (1, 189, 8, 'bfloat16'))
    results = {}  # (n_views, batch, spd, dtype) -> best fps
    for views, batch, spd, dtype in configs:
        if elapsed() > 0.45 * budget:
            # a dead tunnel burns ~25 min per backend-init attempt; stop
            # retrying configs so the host-side stages + JSON line still land
            print('skipping views=%d batch=%d spd=%d dtype=%s (%.0fs elapsed)'
                  % (views, batch, spd, dtype, elapsed()), file=sys.stderr)
            continue
        try:
            fps = measure(batch, steps_per_dispatch=spd, img=(views, 128, 128),
                          compute_dtype=dtype)
            results[(views, batch, spd, dtype)] = fps
        except Exception as e:  # keep the bench robust to transient tunnel errors
            print('views=%d batch=%d spd=%d dtype=%s failed: %s'
                  % (views, batch, spd, dtype, e), file=sys.stderr)

    def _best(views, batch, dtype='bfloat16'):
        """Best fps over spd for one (views, batch, dtype) point."""
        return max([v for (vw, b, _, dt), v in results.items()
                    if (vw, b, dt) == (views, batch, dtype)] or [0.0])

    def _stage(key):
        fps = results.get(key)
        if not fps:
            return None
        views, _, spd, dtype = key
        d = {'frames_per_sec': round(fps, 1),
             'train_gflops_per_frame': round(tf_per_frame[views] / 1e9, 3),
             'steps_per_dispatch': spd, 'dtype': dtype}
        if dtype == 'bfloat16':  # MFU is only meaningful against the bf16 peak
            d['mfu'] = round(mfu(fps, tf_per_frame[views], peak), 4)
        return d

    def _stage_name(key):
        views, batch, spd, dtype = key
        name = '%dview_%d' % (views, batch)
        if spd != 1:
            name += '_spd%d' % spd
        if dtype != 'bfloat16':
            name += '_f32'
        return name

    error = None
    if results:
        # headline = the published workload if it ran (best over spd — the
        # fit() hot loop ships steps_per_dispatch), else the best point
        fps = _best(2, 189)
        if fps:
            head_label = '2x128x128, batch 189'
        else:
            key = max(results, key=results.get)
            fps, head_label = results[key], '%dx128x128, batch %d' % key[:2]
    else:
        # never exit without the JSON line: report the failure and still run
        # every stage that doesn't need the device (staging, parity)
        error = 'all TPU compute configs failed (backend unavailable?)'
        print(error, file=sys.stderr)
        fps, head_label = 0.0, '2x128x128, batch 189'

    # 2. streamed end-to-end training
    streamed = None
    if error is not None:
        print('skipping streamed bench (no working device)', file=sys.stderr)
    elif elapsed() < 0.55 * budget:
        try:
            s_fps, host_gbps, frames_per_epoch, native_used = measure_streamed()
            # what a real TPU host would see: on co-located hardware the
            # host->device copy rides PCIe (>10 GB/s) and overlaps with
            # compute via the prefetch pipeline, so the epoch rate is
            # min(host staging rate, device step rate). Through the axon
            # tunnel the upload serializes at ~0.05 GB/s, which is what
            # bounds `frames_per_sec` here; `projected_frames_per_sec`
            # carries the min-combination bound alongside the raw number.
            # The session is the 2-view headline shape, so all three rates
            # are in 2-view frames (2*128*128 uint8 bytes each).
            host_fps = host_gbps * 1e9 / (2 * 128 * 128)
            step_fps = _best(2, 189) or _best(2, 1024)
            streamed = {
                'shape': '189x2x128x128',
                'native_staging_used': native_used,
                'frames_per_sec': round(s_fps, 1),
                'host_staging_gb_per_sec': round(host_gbps, 3),
                'host_staging_frames_per_sec': round(host_fps, 1),
                'projected_frames_per_sec': round(min(host_fps, step_fps), 1)
                if step_fps else None,
                'frames_per_epoch': frames_per_epoch,
            }
        except Exception as e:
            print('streamed bench failed: %s' % e, file=sys.stderr)
    else:
        print('skipping streamed bench (%.0fs elapsed)' % elapsed(), file=sys.stderr)

    # 2b. 2-view (Musall-shaped) host staging: native kernel vs python
    staging_2view = None
    if elapsed() < 0.65 * budget:
        try:
            native_gbps, fallback_gbps = measure_staging_2view()
            staging_2view = {
                'native_gb_per_sec':
                    round(native_gbps, 3) if native_gbps else None,
                'python_gb_per_sec': round(fallback_gbps, 3),
            }
        except Exception as e:
            print('2-view staging bench failed: %s' % e, file=sys.stderr)
    else:
        print('skipping 2-view staging bench (%.0fs elapsed)' % elapsed(),
              file=sys.stderr)

    # 3. ARHMM EM rate
    em = None
    if error is not None:
        print('skipping EM bench (no working device)', file=sys.stderr)
    elif elapsed() < 0.7 * budget:
        try:
            em = measure_arhmm_em()
        except Exception as e:
            print('arhmm EM bench failed: %s' % e, file=sys.stderr)
    else:
        print('skipping EM bench (%.0fs elapsed)' % elapsed(), file=sys.stderr)

    # 4. torch parity (CPU subprocess)
    parity = None
    if elapsed() < 0.85 * budget:
        try:
            # never let the CPU parity subprocess stall the JSON line past
            # ~1.5x budget, however slow the host
            parity = measure_parity(
                timeout_s=max(600, 1.5 * budget - elapsed()))
        except Exception as e:
            print('parity check failed: %s' % e, file=sys.stderr)
    else:
        print('skipping parity check (%.0fs elapsed)' % elapsed(), file=sys.stderr)

    # vs_baseline is against BASELINE.md's criterion, which is defined for
    # 128x128 *grayscale* (1-view) frames: use the best 1-view point, or if
    # only 2-view configs ran, FLOP-normalize the 2-view rate into
    # grayscale-frame equivalents so the ratio stays comparable across rounds.
    fps_baseline = max(_best(1, 189), _best(1, 1024))
    if not fps_baseline:
        fps_baseline = max(_best(2, 189), _best(2, 1024)) \
            * tf_per_frame[2] / tf_per_frame[1]

    stages = {_stage_name(k): _stage(k) for k in sorted(results, key=str)}
    # headline MFU from the best bf16 (2, 189) point over spd, so a
    # transient failure of the spd=1 config doesn't null the MFU series
    fps_2v189 = _best(2, 189)
    mfu_2v189 = round(mfu(fps_2v189, tf_per_frame[2], peak), 4) \
        if fps_2v189 else None
    print(json.dumps({
        'metric': 'AE train frames/sec/chip (%s)' % head_label,
        'value': round(fps, 1),
        'unit': 'frames/sec',
        'vs_baseline': round(fps_baseline / TARGET_FPS, 3),
        'vs_baseline_fps_1view': round(fps_baseline, 1),
        'fps_2view_189': round(_best(2, 189), 1),
        'fps_2view_189_f32': round(_best(2, 189, 'float32'), 1),
        'fps_1view_189': round(_best(1, 189), 1),
        'fps_1view_1024': round(_best(1, 1024), 1),
        'fps_2view_1024': round(_best(2, 1024), 1),
        'mfu_2view_189': mfu_2v189,
        'stages': stages,
        'peak_tflops': round(peak / 1e12, 1),
        'streamed': streamed,
        'host_staging_2view': staging_2view,
        'arhmm_em_iters_per_sec': em.get('best') if em else None,
        'arhmm_em': em,
        # scalar key kept for round-over-round compatibility (= worst gap);
        # per-model breakdown under its own key
        'parity_converged_rel_gap_pct':
            parity.get('worst') if parity else None,
        'parity_gaps_pct': parity,
        'error': error,
    }))


if __name__ == '__main__':
    main()
