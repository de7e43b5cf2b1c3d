"""Background-thread batch prefetching for the training loop.

The reference reads each trial synchronously from HDF5 inside the train
loop (data_generator.py:229-323). Here a producer thread stays ``depth``
batches ahead so h5py reads + host-side collation overlap with the
device's asynchronous dispatch queue — the TPU never waits on disk for
real-world trial sizes.
"""

import queue
import threading

__all__ = ['prefetched']

_SENTINEL = object()


def prefetched(next_fn, n_batches, depth=2):
    """Yield ``next_fn()`` results for ``n_batches`` calls, produced ahead of time.

    ``next_fn`` is called sequentially from a single producer thread, so any
    RNG-stream the underlying generator consumes is unchanged. Exceptions in
    the producer are re-raised at the consuming site.
    """
    if n_batches <= 0:
        return
    q = queue.Queue(maxsize=depth)
    err = []

    def produce():
        try:
            for _ in range(n_batches):
                q.put(next_fn())
        except BaseException as e:  # re-raised in consumer
            err.append(e)
        finally:
            q.put(_SENTINEL)

    t = threading.Thread(target=produce, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            break
        yield item
    t.join()
    if err:
        raise err[0]
