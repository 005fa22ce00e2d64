"""Prefetching input pipeline: threaded decode → transform → batch → device.

Equivalent of the reference's roibatchLoader + torch DataLoader workers
(ref: lib/roi_data_layer/roibatchLoader.py), re-designed so the TPU never
stalls on host transforms (BASELINE north star): worker threads decode and
normalize frame pairs into pinned numpy batches while a depth-2 prefetch
queue keeps the next batch's H2D transfer in flight during the current step.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Sequence

import numpy as np

from dtt.core.config import InputConfig
from dtt.data.transforms import prepare_pair


class PairLoader:
    """Iterates shuffled roidb frame pairs as stacked batch dicts."""

    def __init__(self, roidb: Sequence[dict], cfg: InputConfig,
                 batch_size: int, seed: int = 0, num_workers: int = 4,
                 prefetch: int = 2, prepare_fn: Callable | None = None,
                 drop_last: bool = True, loop: bool = True,
                 det_fraction: float | None = None):
        assert len(roidb) > 0, "empty roidb"
        self.roidb = list(roidb)
        self.cfg = cfg
        self.batch_size = batch_size
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.prepare_fn = prepare_fn or prepare_pair
        self.drop_last = drop_last
        self.loop = loop
        self._rng = np.random.RandomState(seed)
        self._stop = threading.Event()
        self._batch_q: queue.Queue = queue.Queue(maxsize=prefetch)
        self._started = False
        # DET:VID mixture (input.det_fraction; D&T paper §3.4): entries
        # whose combined_roidb source name contains "det" form the DET
        # group; each batch slot draws DET with p=det_fraction. Requires
        # both groups present — otherwise the knob is ignored.
        self.det_fraction = None
        if det_fraction is not None and det_fraction >= 0.0:
            det_set = {i for i, e in enumerate(self.roidb)
                       if "det" in str(e.get("source", "")).lower()}
            det = sorted(det_set)
            vid = [i for i in range(len(self.roidb)) if i not in det_set]
            if det and vid:
                self.det_fraction = float(det_fraction)
                self._groups = (np.asarray(vid), np.asarray(det))

    # -- index stream -------------------------------------------------------
    def _index_stream(self) -> Iterator[list[int]]:
        n = len(self.roidb)
        if self.det_fraction is not None:
            vid, det = self._groups
            batches_per_epoch = max(n // self.batch_size, 1)
            while True:
                for _ in range(batches_per_epoch):
                    pick_det = self._rng.rand(self.batch_size) < self.det_fraction
                    yield [int(det[self._rng.randint(len(det))]) if d
                           else int(vid[self._rng.randint(len(vid))])
                           for d in pick_det]
                if not self.loop:
                    return
        while True:
            order = self._rng.permutation(n)
            for i in range(0, n - (self.batch_size - 1 if self.drop_last else 0),
                           self.batch_size):
                yield [int(j) for j in order[i:i + self.batch_size]]
            if not self.loop:
                return

    # -- workers ------------------------------------------------------------
    def _producer(self):
        try:
            for idx_batch in self._index_stream():
                if self._stop.is_set():
                    return
                samples = self._pool.map(
                    lambda i: self.prepare_fn(self.roidb[i], self.cfg), idx_batch)
                batch = {k: np.stack([s[k] for s in samples])
                         for k in samples[0]}
                while not self._stop.is_set():
                    try:
                        self._batch_q.put(batch, timeout=0.5)
                        break
                    except queue.Full:
                        continue
        except Exception as e:  # surface worker errors to the consumer
            self._batch_q.put(e)
        finally:
            self._batch_q.put(None)

    def start(self):
        if self._started:
            return self
        from multiprocessing.pool import ThreadPool
        self._pool = ThreadPool(self.num_workers)
        self._thread = threading.Thread(target=self._producer, daemon=True)
        self._thread.start()
        self._started = True
        return self

    def __iter__(self):
        self.start()
        while True:
            item = self._batch_q.get()
            if item is None:
                return
            if isinstance(item, Exception):
                raise item
            yield item

    def stop(self):
        self._stop.set()
        if self._started:
            try:
                while True:
                    self._batch_q.get_nowait()
            except queue.Empty:
                pass
            self._pool.terminate()
        self._started = False


def device_prefetch(iterator, mesh=None, size: int = 2, cast=None):
    """Overlap H2D transfer with compute: keep `size` batches on device.

    A background thread pulls host batches and optionally downcasts selected
    keys (`cast` = {key: np dtype} — e.g. images to bfloat16, which is
    lossless for a bfloat16-compute model and halves the H2D bytes), hiding
    generation/decode latency behind step dispatch. With a mesh the thread
    also completes the sharded device placement; single-device batches are
    yielded as HOST arrays — measured on the tunnel runtime, passing numpy
    straight into the jitted call uploads args as part of the execute
    request (~85 ms for a uint8 batch) and beats explicit per-array
    device_put + sync (~285 ms of tunnel round-trips).
    """
    import queue as _queue
    import threading as _threading

    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P("data")) if mesh is not None else None
    _end = object()

    def put(batch):
        if cast:
            batch = {k: (np.asarray(v).astype(cast[k]) if k in cast else v)
                     for k, v in batch.items()}
        if sharding is not None:
            out = {k: jax.device_put(v, sharding) for k, v in batch.items()}
            # complete the transfer IN THIS THREAD, not at step dispatch
            jax.block_until_ready(out)
            return out
        return batch

    q: _queue.Queue = _queue.Queue(maxsize=size)

    def worker():
        try:
            for batch in iterator:
                q.put(put(batch))
        except Exception as e:  # surface to the consumer
            q.put(e)
        finally:
            q.put(_end)

    t = _threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _end:
            return
        if isinstance(item, Exception):
            raise item
        yield item
