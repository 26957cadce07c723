"""Threaded, prefetching, fixed-shape batch loader.

Replaces torch DataLoader (ref train.py:66-69) with a host-side pipeline tailored to TPU:
static batch shapes (the final ragged batch is padded and carries a validity mask used by
the masked losses), background worker threads, and a prefetch queue that overlaps host IO
with device compute.
"""
from __future__ import annotations

import queue
import random as _random
import threading
from typing import Callable, Iterator, Optional

import numpy as np

from .se_dataset import collate_batch


def device_prefetch(iterator, size: int = 2, sharding=None):
    """Move batches to device `size` steps ahead of consumption, overlapping the
    host→device transfer with the running computation (jax transfers are async).

    Array values are device_put (optionally with a sharding); non-array values pass
    through. Essential here: the dev container's host↔TPU link is a slow tunnel, and
    even on real hosts serial H2D adds ~10-20% step time at batch 300.
    """
    import collections

    import jax

    multihost = jax.process_count() > 1

    def to_device(batch):
        out = {}
        for k, v in batch.items():
            if isinstance(v, np.ndarray) and v.dtype != object:
                if sharding is not None and multihost:
                    # v is this process's LOCAL rows (a sharded DataLoader's
                    # output); assemble the global batch across hosts
                    out[k] = jax.make_array_from_process_local_data(sharding, v)
                elif sharding is not None:
                    out[k] = jax.device_put(v, sharding)
                else:
                    out[k] = jax.device_put(v)
            else:
                out[k] = v
        return out

    buf = collections.deque()
    for batch in iterator:
        buf.append(to_device(batch))
        if len(buf) >= size:
            yield buf.popleft()
    while buf:
        yield buf.popleft()


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        num_workers: int = 1,
        collate_fn: Callable = collate_batch,
        drop_last: bool = False,
        pad_final: bool = True,
        seed: int = 0,
        prefetch: int = 4,
        shard_id: int = 0,
        num_shards: int = 1,
        shuffle_buffer: int = 0,
        shuffle_buffer_mode: str = "sharded",
        emit_dtype: Optional[str] = None,
    ):
        """shard_id/num_shards: multi-host data sharding. batch_size stays the
        GLOBAL batch; every process walks the identical seeded global shuffle and
        emits only its `batch_size // num_shards` rows of each global batch (rows
        [shard_id*Bs:(shard_id+1)*Bs] of the padded global batch), so the global
        batch assembled by parallel.shard_batch / make_array_from_process_local_data
        is bit-identical to the single-host loader's. IO shards naturally: only the
        local rows are gathered from the slice cache.

        shuffle_buffer > 0 switches to STREAMING shuffle: a bounded shuffle
        buffer of that many items replaces the global permutation — O(buffer)
        randomness state, mostly sequential reads (corpora too large for a
        comfortable global shuffle). The ragged tail is dropped. Two sharding
        modes (shuffle_buffer_mode):

        - 'sharded' (default): each shard walks its strided index subset
          (shard_id::num_shards) through its own buffer — maximally sequential
          per-shard IO, but the assembled global batch is NOT bit-identical to
          a single-host buffered loader (shards shuffle independently); every
          shard still emits the same batch count, so multi-host assembly stays
          aligned.
        - 'global': every shard replays the SAME buffered walk over the full
          index space (cheap — index math only) and gathers only its rows of
          each global batch, so the assembled global batch is bit-identical to
          the single-host buffered loader (deterministic cross-shard mode, at
          the cost of per-shard reads no longer being stride-contiguous).

        emit_dtype ('bfloat16' | 'float16' | ...): cast the clean/noisy arrays
        at collate time — halves host->device bytes for bf16 training (mask and
        metadata stay float32). The train step casts to its compute dtype on
        device either way, so this only moves the cast before the transfer."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.collate_fn = collate_fn
        self.drop_last = drop_last
        self.pad_final = pad_final
        self.rng = _random.Random(seed)
        self.prefetch = prefetch
        if num_shards > 1:
            if batch_size % num_shards:
                raise ValueError(
                    f"global batch_size {batch_size} must divide by num_shards "
                    f"{num_shards}")
            if not pad_final and not drop_last:
                raise ValueError("sharded loading needs pad_final or drop_last "
                                 "(shards of a ragged final batch would diverge)")
        if not (0 <= shard_id < num_shards):
            raise ValueError(f"shard_id {shard_id} out of range [0, {num_shards})")
        self.shard_id = shard_id
        self.num_shards = num_shards
        self.shuffle_buffer = int(shuffle_buffer)
        if shuffle_buffer_mode not in ("sharded", "global"):
            raise ValueError(f"shuffle_buffer_mode must be 'sharded' or "
                             f"'global', got {shuffle_buffer_mode!r}")
        self.shuffle_buffer_mode = shuffle_buffer_mode
        self.emit_dtype = np.dtype(emit_dtype) if emit_dtype else None

    def __len__(self):
        n = len(self.dataset)
        if self.shuffle_buffer > 0:
            if self.shuffle_buffer_mode == "global":
                return n // self.batch_size
            return (n // self.num_shards) // (self.batch_size // self.num_shards)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batch_indices(self):
        idx = list(range(len(self.dataset)))
        if self.shuffle:
            self.rng.shuffle(idx)
        for i in range(0, len(idx), self.batch_size):
            b = idx[i : i + self.batch_size]
            if len(b) < self.batch_size and self.drop_last:
                continue
            yield b

    def _make_batch(self, indices):
        n_valid = len(indices)
        if self.num_shards > 1:
            # materialize the padded GLOBAL row list, slice this shard's rows, and
            # gather only those — the concatenation of all shards equals the
            # single-host padded batch exactly
            bs = self.batch_size // self.num_shards
            global_rows = list(indices)
            if n_valid < self.batch_size:
                global_rows += [indices[-1]] * (self.batch_size - n_valid)
            rows = global_rows[self.shard_id * bs:(self.shard_id + 1) * bs]
            batch = self._gather(rows)
            gmask = np.zeros((self.batch_size,), np.float32)
            gmask[:n_valid] = 1.0
            batch["mask"] = gmask[self.shard_id * bs:(self.shard_id + 1) * bs]
            return batch
        batch = self._gather(indices)
        if n_valid < self.batch_size and self.pad_final:
            pad = self.batch_size - n_valid
            for k, v in list(batch.items()):
                if isinstance(v, np.ndarray):
                    reps = np.concatenate([v] + [v[-1:]] * pad, axis=0)
                    batch[k] = reps
                elif isinstance(v, list):
                    batch[k] = v + [v[-1]] * pad
        mask = np.zeros((max(n_valid, self.batch_size if self.pad_final else n_valid),),
                        np.float32)
        mask[:n_valid] = 1.0
        batch["mask"] = mask
        return batch

    def _gather(self, indices):
        gather = getattr(self.dataset, "gather_batch", None)
        if gather is not None and self.collate_fn is collate_batch:
            batch = gather(indices)
            if batch is not None:
                return self._cast(batch)
        samples = [self.dataset[i] for i in indices]
        return self._cast(self.collate_fn(samples))

    def _cast(self, batch: dict) -> dict:
        if self.emit_dtype is not None:
            for k in ("clean", "noisy"):
                if k in batch:
                    batch[k] = np.asarray(batch[k]).astype(self.emit_dtype)
        return batch

    def _buffered_indices(self):
        """Streaming bounded-buffer shuffle. 'sharded': this shard's strided
        subset into local-batch-size rows; 'global': the full index space into
        GLOBAL-batch-size rows (every shard replays the identical walk —
        __iter__ then slices this shard's rows)."""
        rnd = _random.Random(self.rng.random())  # new stream each epoch
        if self.shuffle_buffer_mode == "global":
            seq = range(len(self.dataset))
            emit_size = self.batch_size
        else:
            seq = range(self.shard_id, len(self.dataset), self.num_shards)
            emit_size = self.batch_size // self.num_shards
        n_batches = len(self)
        buf: list = []
        out: list = []
        emitted = 0

        def pop_random():
            j = rnd.randrange(len(buf))
            buf[j], buf[-1] = buf[-1], buf[j]
            return buf.pop()

        for i in seq:
            buf.append(i)
            if len(buf) >= max(self.shuffle_buffer, 1):
                out.append(pop_random() if self.shuffle else buf.pop(0))
                if len(out) == emit_size:
                    yield out
                    out = []
                    emitted += 1
                    if emitted == n_batches:
                        return
        while buf and emitted < n_batches:
            out.append(pop_random() if self.shuffle else buf.pop(0))
            if len(out) == emit_size:
                yield out
                out = []
                emitted += 1

    def __iter__(self) -> Iterator[dict]:
        if self.shuffle_buffer > 0:
            bs_local = self.batch_size // self.num_shards
            for rows in self._buffered_indices():
                if self.shuffle_buffer_mode == "global":
                    rows = rows[self.shard_id * bs_local:
                                (self.shard_id + 1) * bs_local]
                batch = self._gather(rows)
                batch["mask"] = np.ones((bs_local,), np.float32)
                yield batch
            return
        batches = list(self._batch_indices())
        if self.num_workers <= 1:
            for b in batches:
                yield self._make_batch(b)
            return
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        lock = threading.Lock()
        stop = threading.Event()
        it = iter(enumerate(batches))
        results = {}
        next_emit = 0

        def worker():
            # workers collectively produce exactly len(batches) items, then exit;
            # errors are forwarded, and the stop event unblocks q.put when the
            # consumer abandons the iterator early (e.g. evaluate's max_samples break)
            while not stop.is_set():
                with lock:
                    try:
                        i, b = next(it)
                    except StopIteration:
                        return
                try:
                    item = (i, self._make_batch(b), None)
                except Exception as e:  # pragma: no cover - defensive
                    item = (i, None, e)
                while not stop.is_set():
                    try:
                        q.put(item, timeout=0.2)
                        break
                    except queue.Full:
                        continue

        threads = [threading.Thread(target=worker, daemon=True)
                   for _ in range(self.num_workers)]
        for t in threads:
            t.start()
        emitted = 0
        total = len(batches)
        try:
            # emit in order for determinism
            while emitted < total:
                i, batch, err = q.get()
                if err is not None:
                    raise err
                results[i] = batch
                while next_emit in results:
                    yield results.pop(next_emit)
                    next_emit += 1
                    emitted += 1
        finally:
            stop.set()
            try:
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass
            for t in threads:
                t.join(timeout=1.0)
