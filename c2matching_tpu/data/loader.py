"""Host-side data loader: threaded prefetch feeding numpy batches.

Replaces torch.utils.data.DataLoader (mmsr/data/__init__.py:44-93) with a
thread-pool loader producing stacked numpy NHWC batches ready for device
put. JAX-native: no worker processes, no torch collate — items are
prefetched concurrently (PIL/cv2 release the GIL) and stacked with numpy.

Determinism caveat: the datasets draw train-time augmentations from the
GLOBAL np.random/random state (same call sequence as the reference —
the homography parity tests depend on it), so with num_workers > 1 the
thread interleaving makes per-sample draws run-to-run nondeterministic.
The sample ORDER stays deterministic (epoch-seeded). For bit-exact
reproduction of a run, set n_workers: 1 (the reference's multi-worker
runs are only reproducible per fixed worker count for the same reason —
each torch worker owns a forked RNG).
"""
import itertools
import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np


def default_collate(items):
    """Stack a list of sample dicts into a batch dict. Arrays are stacked;
    scalars become numpy arrays; strings/tuples become lists."""
    batch = {}
    for key in items[0]:
        vals = [it[key] for it in items]
        first = vals[0]
        if isinstance(first, np.ndarray):
            batch[key] = np.stack(vals)
        elif isinstance(first, (bool, int, float, np.bool_, np.integer,
                                np.floating)):
            batch[key] = np.asarray(vals)
        else:
            batch[key] = vals
    return batch


class DataLoader:
    """Iterate ``dataset`` in batches with background prefetch.

    Args:
        dataset: indexable with __len__.
        batch_size: per-process batch size.
        sampler: iterable of indices (fresh iterator per epoch) or None.
        shuffle: used when sampler is None.
        num_workers: prefetch thread count (0 = synchronous).
        drop_last: drop the trailing partial batch.
        seed: base shuffle seed when sampler is None.
    """

    def __init__(self, dataset, batch_size=1, sampler=None, shuffle=False,
                 num_workers=0, drop_last=False, seed=0,
                 collate_fn=default_collate):
        self.dataset = dataset
        self.batch_size = batch_size
        self.sampler = sampler
        self.shuffle = shuffle
        self.num_workers = num_workers
        self.drop_last = drop_last
        self.seed = seed
        self.collate_fn = collate_fn
        self._epoch = 0

    def set_epoch(self, epoch):
        self._epoch = epoch
        if self.sampler is not None and hasattr(self.sampler, 'set_epoch'):
            self.sampler.set_epoch(epoch)

    def _indices(self):
        if self.sampler is not None:
            return iter(self.sampler)
        n = len(self.dataset)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self._epoch)
            return iter(rng.permutation(n).tolist())
        return iter(range(n))

    def __len__(self):
        if self.sampler is not None:
            n = len(self.sampler)
        else:
            n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        indices = self._indices()
        if self.num_workers <= 0:
            for batch_idx in _batched(indices, self.batch_size,
                                      self.drop_last):
                yield self.collate_fn(
                    [self.dataset[i] for i in batch_idx])
            return

        yield from self._prefetch_iter(indices)

    def _prefetch_iter(self, indices, depth=2):
        """Prefetch up to ``depth`` batches ahead with a thread pool."""
        batches = _batched(indices, self.batch_size, self.drop_last)
        out_q = queue.Queue(maxsize=depth)
        stop = threading.Event()

        def producer():
            # the sentinel/exception put lives in a finally: a raising
            # dataset.__getitem__ must reach the consumer as the error,
            # not leave it blocked on out_q.get() forever (torch's
            # DataLoader likewise re-raises worker errors)
            err = None
            try:
                with ThreadPoolExecutor(
                        max_workers=self.num_workers) as pool:
                    for batch_idx in batches:
                        if stop.is_set():
                            break
                        items = list(pool.map(self.dataset.__getitem__,
                                              batch_idx))
                        out_q.put(self.collate_fn(items))
            except BaseException as e:  # noqa: BLE001 - forwarded
                err = e
            finally:
                out_q.put(err)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                batch = out_q.get()
                if batch is None:
                    break
                if isinstance(batch, BaseException):
                    raise batch
                yield batch
        finally:
            stop.set()
            # drain so the producer can exit
            while thread.is_alive():
                try:
                    out_q.get_nowait()
                except queue.Empty:
                    break


def _batched(index_iter, batch_size, drop_last):
    while True:
        chunk = list(itertools.islice(index_iter, batch_size))
        if not chunk:
            return
        if len(chunk) < batch_size and drop_last:
            return
        yield chunk
