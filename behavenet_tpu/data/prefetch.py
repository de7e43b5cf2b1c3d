"""Background-thread batch prefetching for the training loop.

The reference reads each trial synchronously from HDF5 inside the train
loop (data_generator.py:229-323). Here a producer thread stays ``depth``
batches ahead so h5py reads + host-side collation overlap with the
device's asynchronous dispatch queue — the TPU never waits on disk for
real-world trial sizes.
"""

import queue
import threading
from concurrent.futures import ThreadPoolExecutor

__all__ = ['prefetched']

_SENTINEL = object()


def prefetched(next_fn, n_batches, depth=2, stage_fn=None, workers=1):
    """Yield ``next_fn()`` results for ``n_batches`` calls, produced ahead of time.

    ``next_fn`` is called sequentially from a single producer thread, so any
    RNG-stream the underlying generator consumes is unchanged. Exceptions in
    the producer are re-raised at the consuming site.

    ``stage_fn`` optionally post-processes each produced item (typically the
    host->device transfer). With ``workers > 1`` the stage calls run in a
    thread pool so several transfers are in flight at once — delivery order
    is still exactly the producer order (futures are consumed in sequence).
    Keep the order-sensitive generator pull in ``next_fn`` and only the
    order-free staging in ``stage_fn``.
    """
    if n_batches <= 0:
        return
    err = []
    stop = threading.Event()
    pool = ThreadPoolExecutor(max_workers=workers) if (
        stage_fn is not None and workers > 1) else None
    # depth=0 keeps its historical meaning: unbounded read-ahead — except
    # with pooled staging, where an unbounded queue would submit the whole
    # epoch's transfers eagerly (device-memory hazard); there the queue
    # bounds the number of stage calls in flight instead
    if depth == 0:
        maxsize = workers if pool is not None else 0
    else:
        # workers only widens the queue when a pool actually exists;
        # otherwise the caller-requested depth bounds host read-ahead
        maxsize = max(depth, workers) if pool is not None else depth
    q = queue.Queue(maxsize=maxsize)

    def put(item):
        # bounded put that aborts if the consumer went away, so an early
        # consumer exit (exception / generator close) can never deadlock
        # against a producer blocked on a full queue
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def produce():
        try:
            for _ in range(n_batches):
                if stop.is_set():
                    return
                item = next_fn()
                if pool is not None:
                    item = pool.submit(stage_fn, item)
                elif stage_fn is not None:
                    item = stage_fn(item)
                if not put(item):
                    return
        except BaseException as e:  # re-raised in consumer
            err.append(e)
        finally:
            put(_SENTINEL)

    t = threading.Thread(target=produce, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _SENTINEL:
                break
            yield item.result() if pool is not None else item
    finally:
        stop.set()
        while t.is_alive():
            try:  # drain so a blocked put can complete
                q.get_nowait()
            except queue.Empty:
                pass
            t.join(timeout=0.1)
        if pool is not None:
            pool.shutdown(wait=False, cancel_futures=True)
    if err:
        raise err[0]
