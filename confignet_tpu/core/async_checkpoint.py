"""Asynchronous checkpoint/metrics worker.

The reference runs its whole checkpoint block (metric generation, image
panels, matplotlib, npz save) inline on the training thread every
``*_checkpoint_period`` steps (confignet_first_stage.py:616-626 ->
run_checkpoints); on a device mesh that stalls every chip for seconds.
Here the trainer snapshots what the checkpoint needs — device-side HBM
copies of the parameter trees (cheap, donation-safe) and list copies of the
loss history — and hands the job to this single ordered worker thread.  The
training loop keeps dispatching fused steps; the heavy host work (device→
host transfer, sqrtm, matplotlib, file IO) overlaps device compute, and the
checkpoint's own device work (metric-batch generation) interleaves on the
device queue instead of serializing the host loop.

One worker, FIFO: jobs see a consistent ordering of ``self.metrics``
appends and checkpoint writes.  Errors are captured and re-raised on the
next ``submit``/``drain``/``close`` so a failing checkpoint cannot be
silently lost.
"""
from __future__ import annotations

import queue
import threading
import traceback
from typing import Callable, Optional


class CheckpointWorker:
    """Single background thread executing checkpoint jobs in order.

    The queue is BOUNDED (default 2 pending jobs): every queued job pins a
    full HBM snapshot of the parameter trees, so if checkpoint wall time
    ever exceeds the checkpoint period, ``submit`` blocks the trainer until
    a slot frees — throttling to checkpoint speed instead of growing an
    unbounded chain of model copies until OOM."""

    def __init__(self, name: str = "checkpoint-worker", max_pending: int = 2):
        self._queue: "queue.Queue[Optional[Callable[[], None]]]" = queue.Queue(
            maxsize=max_pending)
        self._error: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._run, name=name, daemon=True)
        self._thread.start()

    def _run(self) -> None:
        while True:
            job = self._queue.get()
            try:
                if job is None:
                    return
                job()
            except BaseException as exc:  # noqa: BLE001 — surfaced on next submit/drain
                traceback.print_exc()
                if self._error is None:
                    # Keep the FIRST failure: later queued jobs usually fail
                    # from the same root cause (full disk, dead device) and
                    # would mask it.
                    self._error = exc
            finally:
                self._queue.task_done()

    def _raise_pending(self) -> None:
        if self._error is not None:
            err, self._error = self._error, None
            raise RuntimeError("async checkpoint job failed") from err

    def submit(self, job: Callable[[], None]) -> None:
        self._raise_pending()
        self._queue.put(job)

    def drain(self) -> None:
        """Block until every queued job has finished; re-raise failures."""
        self._queue.join()
        self._raise_pending()

    def close(self) -> None:
        """Run all pending jobs, stop the thread, re-raise failures."""
        self._queue.put(None)
        self._thread.join()
        self._raise_pending()
