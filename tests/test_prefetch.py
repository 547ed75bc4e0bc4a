"""Prefetching loader: ordering, state restore, overlap."""

import time

import numpy as np

from tpudenoise.data.prefetch import PrefetchLoader


class FakeLoader:
    """Deterministic loader with a cursor and synthetic latency."""

    def __init__(self, delay=0.02):
        self.cursor = 0
        self.delay = delay

    def forward(self):
        time.sleep(self.delay)
        self.cursor += 1
        return {'idx': self.cursor - 1,
                'data': np.full((4,), self.cursor - 1.0)}

    def get_state(self):
        return {'cursor': self.cursor}

    def set_state(self, state):
        self.cursor = state['cursor']


def test_prefetch_preserves_order():
    pf = PrefetchLoader(FakeLoader(), depth=3)
    idxs = [pf.forward()['idx'] for _ in range(10)]
    assert idxs == list(range(10))
    pf.close()


def test_prefetch_overlaps_latency():
    delay = 0.03
    pf = PrefetchLoader(FakeLoader(delay), depth=3)
    pf.forward()
    time.sleep(4 * delay)  # let the queue fill
    t0 = time.perf_counter()
    for _ in range(3):
        pf.forward()
    dt = time.perf_counter() - t0
    assert dt < 2 * delay  # served from the queue, not produced inline
    pf.close()


def test_state_restore_is_exact():
    """Snapshot reflects the last CONSUMED batch, not the read-ahead
    cursor: restore replays exactly the batches seen after the snapshot."""
    inner = FakeLoader(delay=0.005)
    pf = PrefetchLoader(inner, depth=2)
    a = [pf.forward()['idx'] for _ in range(3)]
    st = pf.get_state()
    assert st['cursor'] == 3  # not advanced by queued batches
    b = [pf.forward()['idx'] for _ in range(3)]
    pf.set_state(st)
    c = [pf.forward()['idx'] for _ in range(3)]
    assert a == [0, 1, 2]
    assert c == b == [3, 4, 5]
    pf.close()


def test_state_before_any_consumption():
    inner = FakeLoader(delay=0.005)
    pf = PrefetchLoader(inner, depth=2)
    time.sleep(0.05)  # let the worker run ahead
    st = pf.get_state()
    assert st['cursor'] == 0
    pf.close()
