"""Asynchronous host->device batch prefetching.

The reference samples numpy batches synchronously inside its eager training
loop (confignet_first_stage.py:597-626), serializing host indexing, the
host->device copy, and the device step.  TPU-native training overlaps all
three: a background thread runs the (numpy/C++) batch sampler and stages the
result on device with ``jax.device_put`` while the accelerator executes the
current step.  ``jax.device_put`` is itself asynchronous, but the host-side
work it hides is not — uint8 gathers of tens of MB and (on remote-attached
TPUs) the transfer enqueue both block the caller; moving them off the main
thread keeps the step-dispatch loop hot.

Depth 2 (one batch in flight, one ready) is enough to reach steady state;
deeper queues only add host memory pressure.
"""
from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Optional


class BatchPrefetcher:
    """Runs ``sample_fn`` in a background thread and stages results on device.

    ``sample_fn`` must return a pytree of numpy arrays (or already-placed
    jax.Arrays, e.g. from ``shard_batch`` when training over a mesh — those
    pass through untouched).  Call :meth:`next` to obtain batches in order;
    always :meth:`close` (or use as a context manager) so the worker exits.
    """

    _SENTINEL = object()

    def __init__(self, sample_fn: Callable[[], Any], depth: int = 2,
                 device_put: bool = True):
        import jax

        self._sample_fn = sample_fn
        self._device_put = jax.device_put if device_put else (lambda x: x)
        self._queue: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
        self._stop = threading.Event()
        self._error: Optional[BaseException] = None
        self._thread = threading.Thread(
            target=self._worker, name="batch-prefetcher", daemon=True
        )
        self._thread.start()

    def _worker(self) -> None:
        try:
            while not self._stop.is_set():
                batch = self._device_put(self._sample_fn())
                # Poll the bounded put so close() can't deadlock the worker.
                while not self._stop.is_set():
                    try:
                        self._queue.put(batch, timeout=0.1)
                        break
                    except queue.Full:
                        continue
        except BaseException as exc:  # surfaced to the consumer in next()
            self._error = exc
            self._stop.set()  # no live producer remains; next() must not block
            self._queue.put(self._SENTINEL)

    def next(self) -> Any:
        if self._error is not None:
            # Re-raise on every call after the worker died — a second next()
            # would otherwise block forever on an empty queue.
            raise self._error
        if self._stop.is_set():
            raise RuntimeError("BatchPrefetcher is closed")
        item = self._queue.get()
        if item is self._SENTINEL:
            assert self._error is not None
            raise self._error
        return item

    def close(self) -> None:
        self._stop.set()
        # Unblock a worker waiting on a full queue.
        try:
            while True:
                self._queue.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=5.0)

    def __enter__(self) -> "BatchPrefetcher":
        return self

    def __exit__(self, *exc_info) -> None:
        self.close()
