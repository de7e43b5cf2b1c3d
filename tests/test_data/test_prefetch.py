"""Prefetch pipeline: ordering, staging, and shutdown behavior."""

import threading
import time

import pytest

from behavenet_tpu.data.prefetch import prefetched


class TestOrdering:

    def test_sequential_order_preserved(self):
        out = list(prefetched(iter(range(20)).__next__, 20, depth=3))
        assert out == list(range(20))

    def test_staged_parallel_order_preserved(self):
        src = iter(range(50))
        out = list(prefetched(src.__next__, 50, depth=4,
                              stage_fn=lambda x: x * 10, workers=4))
        assert out == [x * 10 for x in range(50)]

    def test_depth_zero_unbounded(self):
        """depth=0 keeps its unbounded-read-ahead meaning: the producer can
        run arbitrarily far ahead of a slow consumer."""
        produced = []

        def next_fn():
            val = len(produced)
            produced.append(val)
            return val

        gen = prefetched(next_fn, 30, depth=0)
        first = next(gen)
        deadline = time.time() + 5.0  # producer should finish all 30 unprompted
        while len(produced) < 30 and time.time() < deadline:
            time.sleep(0.02)
        assert len(produced) == 30
        assert [first] + list(gen) == list(range(30))


class TestShutdown:

    def test_producer_error_reraised(self):
        def next_fn():
            raise ValueError('boom')
        with pytest.raises(ValueError, match='boom'):
            list(prefetched(next_fn, 5, depth=2))

    def test_stage_error_reraised_without_hang(self):
        def stage(x):
            if x == 3:
                raise RuntimeError('stage boom')
            return x
        with pytest.raises(RuntimeError, match='stage boom'):
            list(prefetched(iter(range(20)).__next__, 20, depth=2,
                            stage_fn=stage, workers=4))

    def test_early_consumer_exit_does_not_deadlock(self):
        """Closing the generator while the producer is blocked on a full
        queue must not hang (the regression a bare t.join() would cause)."""
        n_threads_before = threading.active_count()
        gen = prefetched(iter(range(1000)).__next__, 1000, depth=2)
        assert next(gen) == 0
        done = []

        def close():
            gen.close()  # triggers GeneratorExit -> finally -> join path
            done.append(True)

        t = threading.Thread(target=close)
        t.start()
        t.join(timeout=10.0)
        assert done, 'generator close deadlocked against the producer'
        # give the producer thread a moment to exit fully
        for _ in range(50):
            if threading.active_count() <= n_threads_before:
                break
            time.sleep(0.05)
