"""Host-pipeline helpers: ordered prefetch mapping and bounded async writes."""

import threading
import time
from concurrent.futures import ThreadPoolExecutor

import pytest

from satlas_sr_tpu.inference import BoundedWriter, batched, prefetch_map


def test_prefetch_map_preserves_order_and_prefetches():
    started = []
    lock = threading.Lock()

    def work(x):
        with lock:
            started.append(x)
        return x * 10

    with ThreadPoolExecutor(max_workers=4) as pool:
        gen = prefetch_map(pool, work, range(6), depth=3)
        first = next(gen)
        assert first == 0
        # with depth=3, items beyond the first were submitted before it was
        # consumed (allow scheduler slack: at least the initial window)
        with lock:
            assert len(started) >= 3
        assert list(gen) == [10, 20, 30, 40, 50]


def test_prefetch_map_propagates_worker_errors():
    def work(x):
        if x == 2:
            raise RuntimeError("boom")
        return x

    with ThreadPoolExecutor(max_workers=2) as pool:
        gen = prefetch_map(pool, work, range(4), depth=2)
        assert next(gen) == 0
        assert next(gen) == 1
        with pytest.raises(RuntimeError, match="boom"):
            next(gen)


def test_bounded_writer_caps_in_flight_and_drains():
    gate = threading.Event()
    done = []

    def slow_write(x):
        gate.wait(5)
        done.append(x)

    with ThreadPoolExecutor(max_workers=1) as pool:
        w = BoundedWriter(pool, max_pending=2)
        w.submit(slow_write, 0)
        w.submit(slow_write, 1)
        assert len(w._pending) == 2
        t0 = time.time()
        t = threading.Thread(target=w.submit, args=(slow_write, 2))
        t.start()
        time.sleep(0.05)
        assert t.is_alive()  # third submit blocks on the oldest write
        gate.set()
        t.join(5)
        assert not t.is_alive()
        w.drain()
        assert sorted(done) == [0, 1, 2]
        assert time.time() - t0 < 5


def test_bounded_writer_surfaces_errors_on_drain():
    def bad_write(x):
        raise OSError("disk full")

    with ThreadPoolExecutor(max_workers=1) as pool:
        w = BoundedWriter(pool, max_pending=4)
        w.submit(bad_write, 0)
        with pytest.raises(OSError, match="disk full"):
            w.drain()


def test_batched_covers_all_items():
    assert batched(list(range(7)), 3) == [[0, 1, 2], [3, 4, 5], [6]]
