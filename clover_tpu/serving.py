"""Continuous-batching MVM server (BASELINE.json north-star component).

The reference is a synchronous library; a production TPU deployment
serves many concurrent quantized-MVM requests against a resident matrix.
This server implements continuous batching: requests accumulate in a
queue, a dispatcher thread packs up to ``max_batch`` of them into one
stacked container, runs a single fused batched MVM (ops/gemm.mvm_batched
— one MXU pass over the resident matrix for the whole batch), and
resolves each request's future.

Batch sizes are bucketed to powers of two so XLA compiles a bounded set
of programs; short batches are padded with the first request's vector and
the padding results dropped.

Works with a matrix resident on one chip or sharded over a mesh (pass the
already-placed container; the batched MVM follows its sharding).
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future

import jax
import jax.numpy as jnp

from .ops.gemm import mvm_batched

_BUCKETS = (1, 2, 4, 8, 16, 32)


class MVMServer:
    def __init__(self, qA, max_batch: int = 8, max_wait_s: float = 0.002,
                 key=None):
        assert max_batch in _BUCKETS
        self._qA = qA
        self._max_batch = max_batch
        self._max_wait = max_wait_s
        self._key = key
        self._q: queue.Queue = queue.Queue()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    # -- client API --------------------------------------------------------

    def submit(self, qx) -> Future:
        """Enqueue a quantized vector; resolves to the quantized result.

        Raises ``RuntimeError`` after :meth:`close` — the dispatcher has
        stopped, so an enqueued future would never resolve."""
        if self._stop.is_set():
            raise RuntimeError("MVMServer is closed")
        fut: Future = Future()
        self._q.put((qx, fut))
        return fut

    def mvm(self, qx):
        """Synchronous convenience wrapper."""
        return self.submit(qx).result()

    def close(self):
        self._stop.set()
        self._thread.join(timeout=5)
        # Fail anything still queued so no caller blocks forever.
        while True:
            try:
                _, fut = self._q.get_nowait()
            except queue.Empty:
                break
            if not fut.done():
                fut.set_exception(RuntimeError("MVMServer closed"))

    # -- dispatcher --------------------------------------------------------

    def _drain(self):
        """Collect up to max_batch requests; ``max_wait_s`` is a single
        deadline for the whole straggler wait, not per get."""
        try:
            first = self._q.get(timeout=0.05)
        except queue.Empty:
            return []
        batch = [first]
        deadline = time.monotonic() + self._max_wait
        while len(batch) < self._max_batch:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                batch.append(self._q.get(timeout=remaining))
            except queue.Empty:
                break
        return batch

    def _loop(self):
        while not self._stop.is_set():
            batch = self._drain()
            if not batch:
                continue
            try:
                self._run(batch)
            except Exception as e:         # resolve futures with the error
                for _, fut in batch:
                    if not fut.done():
                        fut.set_exception(e)

    def _run(self, batch):
        n = len(batch)
        size = next(b for b in _BUCKETS if b >= n)
        vecs = [qx for qx, _ in batch]
        vecs += [vecs[0]] * (size - n)              # pad to the bucket
        xs = jax.tree.map(lambda *a: jnp.stack(a), *vecs)
        if self._key is not None:
            self._key, sub = jax.random.split(self._key)
        else:
            sub = None
        ys = mvm_batched(self._qA, xs, key=sub)
        for i, (_, fut) in enumerate(batch):
            yi = jax.tree.map(lambda a: a[i], ys)
            fut.set_result(yi)
