"""Host data loaders with background prefetch.

Replaces deepim/core/loader.py (TrainDataLoader :111-360, TestDataLoader
:17-108) and lib/utils/PrefetchingIter.py.  The reference builds per-GPU
ndarray lists with a multiprocessing.Pool and a one-batch-ahead prefetch
thread; here a thread pool decodes samples (cv2 releases the GIL) and a
bounded queue keeps N batches in flight.  Batches are plain numpy pytrees —
device placement/sharding happens in the training driver
(parallel.shard_pytree_batch).

Unlike the reference loader, no rendered images/depths and no flow labels
are loaded or computed on host: the engine renders and refreshes labels on
device (SURVEY.md §7.1), so the host side only decodes the observed data.

Determinism invariant: every random draw is keyed by (seed, epoch,
global_slot) — the shuffle rng is re-derived per epoch and each sample's
augmentation rngs (mask dilation, VOC background choice, point sampling)
are derived from the sample's position in the global shuffled stream.
Thread scheduling inside the pool and process sharding therefore cannot
change results: all processes of a multi-host run see the same global
batch order and produce bit-identical samples for the same slot.  (The
reference's multiprocessing loader has no such guarantee; the round-1
implementation here shared one rng across pool threads, which broke the
same-shuffle-everywhere invariant from epoch 2 onward.)
"""
from __future__ import annotations

import queue
import random
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Iterator

import numpy as np

from deepim_tpu.config import Config
from deepim_tpu.data.preprocess import (
    DecodeCache,
    VOCBackgrounds,
    make_test_sample,
    make_train_sample,
)
from deepim_tpu.engine.train import TrainBatch


def _stack(samples: list[dict[str, np.ndarray]], key: str) -> np.ndarray:
    return np.stack([s[key] for s in samples])


class TrainLoader:
    """Shuffled, epoch-based training batches."""

    def __init__(
        self,
        pairdb: list[dict],
        cfg: Config,
        points_by_class: dict[str, np.ndarray],
        batch_size: int,
        seed: int = 0,
        num_workers: int = 2,
        prefetch: int = 2,
        process_index: int | None = None,
        process_count: int | None = None,
        decode_cache_mb: int = 8192,
    ):
        self.pairdb = pairdb
        self.cfg = cfg
        self.points_by_class = points_by_class
        self.batch_size = batch_size  # GLOBAL batch size
        # Multi-host sharding: every process shuffles with the same seed, so
        # the global batch order is identical everywhere; each process
        # assembles only its contiguous slice of each batch (matching the
        # contiguous device order of the 1-D dp mesh).
        if process_index is None:
            import jax

            process_index = jax.process_index()
            process_count = jax.process_count()
        self.process_index = process_index
        self.process_count = process_count or 1
        if batch_size % self.process_count:
            raise ValueError(
                f"global batch {batch_size} not divisible by {self.process_count} processes"
            )
        self.local_batch_size = batch_size // self.process_count
        self.class_name = list(cfg.dataset.class_name)
        self.k = cfg.dataset.intrinsic_matrix()
        self.seed = seed
        self._epoch_counter = 0
        self.voc = VOCBackgrounds(cfg.dataset.root_path)
        self.pool = ThreadPoolExecutor(max_workers=num_workers)
        self.prefetch = prefetch
        # Decode+resize results are immutable; memoize them across epochs
        # (0 disables).  On few-core hosts the decode otherwise bounds the
        # epoch: see DecodeCache.
        self.cache = DecodeCache(decode_cache_mb) if decode_cache_mb else None

    @property
    def epoch_size(self) -> int:
        return len(self.pairdb) // self.batch_size

    def _make_sample(self, rec: dict, epoch: int, global_slot: int) -> dict[str, np.ndarray]:
        """Build one sample with rngs derived from (seed, epoch, global_slot)
        so results are independent of thread scheduling and process sharding."""
        words = np.random.SeedSequence([self.seed, epoch, global_slot]).generate_state(8)
        rng = random.Random(int.from_bytes(words[:2].tobytes(), "little"))
        nprng = np.random.RandomState(words[2:])
        s = make_train_sample(
            rec, self.cfg, self.points_by_class[rec["gt_class"]], rng, nprng, self.voc,
            cache=self.cache,
        )
        s["class_index"] = np.int32(self.class_name.index(rec["gt_class"]))
        return s

    def _assemble(self, recs: list[dict], epoch: int, slots: list[int]) -> TrainBatch:
        samples = list(
            self.pool.map(lambda args: self._make_sample(*args), zip(recs, [epoch] * len(recs), slots))
        )
        has_pm = "points_model" in samples[0]
        has_depth = "depth_observed" in samples[0]
        return TrainBatch(
            image_observed=_stack(samples, "image_observed"),
            mask_observed=_stack(samples, "mask_observed"),
            mask_gt_observed=_stack(samples, "mask_gt_observed"),
            depth_gt_observed=_stack(samples, "depth_gt_observed"),
            pose_rendered=_stack(samples, "pose_rendered"),
            pose_observed=_stack(samples, "pose_observed"),
            class_index=_stack(samples, "class_index"),
            points_model=_stack(samples, "points_model") if has_pm else np.zeros((len(samples), 1, 3), np.float32),
            points_weights=_stack(samples, "points_weights") if has_pm else np.zeros((len(samples), 1), np.float32),
            k=self.k,
            depth_observed=_stack(samples, "depth_observed") if has_depth else None,
        )

    def epoch(self, epoch: int | None = None) -> Iterator[TrainBatch]:
        """One shuffled epoch with background prefetch (PrefetchingIter.py:34-69).

        `epoch` keys the shuffle and all augmentation rngs; when omitted an
        internal counter is used (epoch 0, 1, ... in call order)."""
        if epoch is None:
            epoch = self._epoch_counter
            self._epoch_counter += 1
        if self.cfg.TRAIN.SHUFFLE:
            shuffle_rng = np.random.RandomState(
                np.random.SeedSequence([self.seed, epoch]).generate_state(8)
            )
            order = shuffle_rng.permutation(len(self.pairdb)).tolist()
        else:
            order = list(range(len(self.pairdb)))
        n_batches = self.epoch_size
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = object()

        def producer():
            lo = self.process_index * self.local_batch_size
            for bi in range(n_batches):
                slots = [bi * self.batch_size + lo + j for j in range(self.local_batch_size)]
                recs = [self.pairdb[order[s]] for s in slots]
                q.put(self._assemble(recs, epoch, slots))
            q.put(stop)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            yield item
        t.join()


class TestLoader:
    """Ordered test batches; the last batch is padded to full size with
    repeats (returns the number of valid samples alongside).  Replaces the
    batch-1-per-GPU TestDataLoader (loader.py:17-108)."""

    __test__ = False  # not a pytest class

    def __init__(self, pairdb: list[dict], cfg: Config, batch_size: int, num_workers: int = 2,
                 decode_cache_mb: int = 0):
        # decode_cache_mb defaults OFF here (unlike TrainLoader): a test pass
        # visits each image once, so a cache only accrues host RSS with a
        # near-zero hit rate — on hosts already memory-pressured by the
        # tunnel client's per-batch leak.  Enable it only when the pairdb
        # revisits paths (e.g. repeated eval sweeps in one process).
        self.pairdb = pairdb
        self.cfg = cfg
        self.batch_size = batch_size
        self.class_name = list(cfg.dataset.class_name)
        self.k = cfg.dataset.intrinsic_matrix()
        self.pool = ThreadPoolExecutor(max_workers=num_workers)
        self.cache = DecodeCache(decode_cache_mb) if decode_cache_mb else None

    def __len__(self) -> int:
        return -(-len(self.pairdb) // self.batch_size)

    def _make_sample(self, rec: dict, index: int) -> dict[str, np.ndarray]:
        # Deterministic per-record rng (TEST.MASK_DILATE draws; keyed by the
        # record's dataset position so batching cannot change results).
        rng = random.Random(
            int.from_bytes(np.random.SeedSequence([17, index]).generate_state(2).tobytes(), "little")
        )
        s = make_test_sample(rec, self.cfg, rng, cache=self.cache)
        s["class_index"] = np.int32(self.class_name.index(rec["gt_class"]))
        return s

    def batches(self) -> Iterator[tuple[dict[str, Any], int]]:
        n = len(self.pairdb)
        for start in range(0, n, self.batch_size):
            idxs = [min(start + j, n - 1) for j in range(self.batch_size)]
            recs = [self.pairdb[i] for i in idxs]
            valid = min(self.batch_size, n - start)
            samples = list(self.pool.map(lambda a: self._make_sample(*a), zip(recs, idxs)))
            batch = {
                "image_observed": _stack(samples, "image_observed"),
                "mask_observed": _stack(samples, "mask_observed"),
                "pose_rendered": _stack(samples, "pose_rendered"),
                "pose_observed": _stack(samples, "pose_observed"),
                "class_index": _stack(samples, "class_index"),
                "k": self.k,
            }
            if "depth_observed" in samples[0]:
                batch["depth_observed"] = _stack(samples, "depth_observed")
            yield batch, valid
