"""Prefetching host-side loader producing uint8 NHWC numpy batches.

Replaces the reference's torch DataLoader + DistributedSampler + uint8 collate
(reference data.py:36-76,147,154-178) with a JAX-native shape:

* per-host sharding — each process reads ``order[pidx::pcount]`` of a seeded
  global permutation, the GSPMD analog of torch's DistributedSampler,
* threaded JPEG decode + augment into a pinned prefetch queue,
* static batch shapes — the last partial batch is padded and carries a
  per-example validity mask, so eval metrics are exact without retracing,
* uint8 NHWC transfer; normalization runs on device (reference data.py:153-164).
"""

from __future__ import annotations

import dataclasses
import queue
import sys
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional

import numpy as np
from PIL import Image

from hvt import config as config_lib
from hvt import hierarchy
from hvt.data import folder as folder_lib
from hvt.data import native as native_lib
from hvt.data import synthetic as synthetic_lib
from hvt.data import transforms as T


def _native_eligible(dataset, transform) -> bool:
    """The C++ core covers decode + RandomResizedCrop + resize + flip over
    JPEG folders. RandAugment/ColOut are PIL-op based but apply *after* the
    crop, so they run as a post pass over the small cropped arrays
    (TrainTransform.post_augment) — the native path stays eligible."""
    if not isinstance(dataset, folder_lib.FolderDataset):
        return False
    if not isinstance(transform, (T.EvalTransform, T.TrainTransform)):
        return False
    sample = dataset.paths[:8]
    if not all(p.lower().endswith((".jpg", ".jpeg")) for p in sample):
        return False
    return native_lib.available()


@dataclasses.dataclass
class Batch:
    """One host-local batch. images uint8 (B,H,W,3); mask 1.0 for real rows."""

    images: np.ndarray
    labels: np.ndarray  # (B,) or (B, N_TIERS) int32
    mask: np.ndarray  # (B,) float32
    # Dataset indices of each row (-1 for padding) — lets consumers map rows
    # back to file paths (e.g. hvt.downstream.predict writes them per image).
    indices: Optional[np.ndarray] = None

    @property
    def size(self) -> int:
        return self.images.shape[0]


def _decode_folder_sample(dataset, index: int, transform, rng) -> np.ndarray:
    with Image.open(dataset.paths[index]) as img:
        return transform(img, rng)


class Loader:
    """Iterable over epochs of host-local batches.

    One instance per (dataset, split); call :meth:`epoch` with the epoch index
    to get a deterministic, shuffled (if requested), host-sharded iterator.
    """

    def __init__(
        self,
        dataset,
        transform,
        local_batch_size: int,
        *,
        shuffle: bool = False,
        drop_last: bool = False,
        seed: int = 0,
        num_workers: int = 8,
        prefetch_batches: int = 2,
        process_index: int = 0,
        process_count: int = 1,
    ):
        self.dataset = dataset
        self.transform = transform
        self.local_batch_size = local_batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.num_workers = max(1, num_workers)
        self.prefetch_batches = max(1, prefetch_batches)
        self.process_index = process_index
        self.process_count = process_count

        self.use_native = _native_eligible(dataset, transform)

        n_local = len(range(process_index, len(dataset), process_count))
        if drop_last:
            self.batches_per_epoch = n_local // local_batch_size
        else:
            self.batches_per_epoch = -(-n_local // local_batch_size)
        if self.batches_per_epoch == 0:
            raise ValueError(
                f"dataset ({n_local} local samples) smaller than one batch "
                f"({local_batch_size}) with drop_last"
            )

    # -- sample order -------------------------------------------------------

    def epoch_indices(self, epoch: int) -> np.ndarray:
        """The dataset indices this host visits in `epoch`, in batch order.

        Pure function of (seed, epoch) — consumers that only need labels
        (e.g. hvt.downstream.features) read `dataset.labels[epoch_indices(e)]`
        instead of decoding every image."""
        return self._epoch_indices(epoch)

    def _epoch_indices(self, epoch: int) -> np.ndarray:
        n = len(self.dataset)
        if self.shuffle:
            order = np.random.default_rng((self.seed, epoch)).permutation(n)
        else:
            order = np.arange(n)
        local = order[self.process_index :: self.process_count]
        if self.drop_last:
            local = local[: self.batches_per_epoch * self.local_batch_size]
        return local

    # -- decode -------------------------------------------------------------

    def _load_one(self, epoch: int, index: int) -> np.ndarray:
        if isinstance(self.dataset, synthetic_lib.SyntheticDataset):
            return self.dataset.load(index)
        rng = np.random.default_rng((self.seed, epoch, int(index)))
        return _decode_folder_sample(self.dataset, index, self.transform, rng)

    def _native_batch_images(
        self, pool: ThreadPoolExecutor, epoch: int, idxs: np.ndarray
    ) -> np.ndarray:
        tf = self.transform
        is_train = isinstance(tf, T.TrainTransform)
        paths = [self.dataset.paths[int(i)] for i in idxs]
        # Per-sample seed mixes (seed, epoch, index); splitmix64 finishes the
        # diffusion on the C side.
        seeds = [
            ((self.seed & 0xFFFFF) << 44) ^ ((epoch & 0xFFFFF) << 24) ^ int(i)
            for i in idxs
        ]
        images, failures = native_lib.load_batch(
            paths,
            seeds,
            is_train=is_train,
            resize_size=tf.resize_size,
            out_size=tf.crop_size,
            num_threads=self.num_workers,
        )
        failed_rows = set()
        if failures:
            # Rare corrupt files: decode the failed slots via PIL (the full
            # transform, including any post ops).
            for row, i in enumerate(idxs):
                if not images[row].any():
                    failed_rows.add(row)
                    rng = np.random.default_rng((self.seed, epoch, int(i)))
                    images[row] = _decode_folder_sample(
                        self.dataset, int(i), self.transform, rng
                    )
        if is_train and tf.has_post_ops:
            # RandAugment / ColOut over the small cropped arrays (see
            # _native_eligible); per-sample streams disjoint from the PIL
            # path's (seed, epoch, index) decode streams. Rows are
            # independent — fan out over the worker pool rather than
            # serializing the PIL pass on the producer thread.
            def _post(row_i):
                row, i = row_i
                rng = np.random.default_rng((self.seed, epoch, int(i), 0xA6))
                return row, tf.post_augment(images[row], rng)

            todo = [
                (row, i) for row, i in enumerate(idxs)
                if row not in failed_rows
            ]
            # A single-worker pool just adds queue/switch overhead per row
            # (measured −26% on the 1-core dev host) — stay serial there.
            results = pool.map(_post, todo) if self.num_workers > 1 else map(_post, todo)
            for row, arr in results:
                images[row] = arr
        return images

    def _make_batch(self, pool: ThreadPoolExecutor, epoch: int, idxs: np.ndarray) -> Batch:
        bs = self.local_batch_size
        n_valid = len(idxs)
        if self.use_native:
            arrays = self._native_batch_images(pool, epoch, idxs)
            h, w, c = arrays[0].shape
        else:
            arrays = list(pool.map(lambda i: self._load_one(epoch, int(i)), idxs))
            h, w, c = arrays[0].shape
        images = np.zeros((bs, h, w, c), dtype=np.uint8)
        for row, arr in enumerate(arrays):
            images[row] = arr

        label_arr = self.dataset.labels[idxs]
        if label_arr.ndim == 1:
            labels = np.zeros((bs,), dtype=np.int32)
        else:
            labels = np.zeros((bs, label_arr.shape[1]), dtype=np.int32)
        labels[:n_valid] = label_arr

        mask = np.zeros((bs,), dtype=np.float32)
        mask[:n_valid] = 1.0
        row_idx = np.full((bs,), -1, dtype=np.int64)
        row_idx[:n_valid] = idxs
        return Batch(images=images, labels=labels, mask=mask, indices=row_idx)

    # -- iteration ----------------------------------------------------------

    def epoch(self, epoch: int, start_batch: int = 0) -> Iterator[Batch]:
        """Iterate the epoch's batches, optionally skipping the first
        ``start_batch`` (exact mid-epoch resume: the order is a pure function
        of (seed, epoch), so slicing the schedule reproduces the remainder of
        an interrupted epoch without decoding the skipped images)."""
        indices = self._epoch_indices(epoch)
        bs = self.local_batch_size
        chunks = [indices[i : i + bs] for i in range(0, len(indices), bs)]
        if start_batch:
            chunks = chunks[start_batch:]

        out_q: queue.Queue = queue.Queue(maxsize=self.prefetch_batches)
        sentinel = object()
        stop = threading.Event()
        error: list[BaseException] = []
        # Bound now: if an abandoned generator is finalized at interpreter
        # shutdown, module globals (queue, threading internals) may already
        # be torn down when the finally below runs — skip the drain/join
        # then (the producer is a daemon thread; the process is exiting).
        queue_empty = queue.Empty
        finalizing = sys.is_finalizing

        def _put(item) -> bool:
            """Bounded put that gives up when the consumer went away."""
            while not stop.is_set():
                try:
                    out_q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    for chunk in chunks:
                        if stop.is_set():
                            return
                        if not _put(self._make_batch(pool, epoch, chunk)):
                            return
            except BaseException as e:  # surfaced in the consumer, not lost
                error.append(e)
            finally:
                _put(sentinel)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = out_q.get()
                if item is sentinel:
                    if error:
                        raise RuntimeError(
                            f"data loader worker failed on epoch {epoch}"
                        ) from error[0]
                    break
                yield item
            thread.join()
        finally:
            # Early exit (end of training mid-epoch, or a consumer error):
            # unblock and retire the producer instead of leaking it.
            stop.set()
            if not finalizing():
                while True:
                    try:
                        out_q.get_nowait()
                    except queue_empty:
                        break
                thread.join(timeout=30)


# ---------------------------------------------------------------------------
# Builders (reference data.py:98-170)
# ---------------------------------------------------------------------------


def build_dataset(
    config: config_lib.Config, is_train: bool
) -> tuple[object, folder_lib.DatasetInfo]:
    """Scan/construct the split's dataset and its DatasetInfo.

    Mirrors reference data.py:98-170: multitask variant selects the
    hierarchical dataset; the tree-distance matrix is built only for
    eval-style runs (config.is_train == False).
    """
    data_cfg = config.train_dataset if is_train else config.eval_dataset
    split = "train" if is_train else "val"
    hierarchical = config.hierarchy.variant == "multitask"

    if data_cfg.source == "synthetic":
        dataset = synthetic_lib.build_synthetic(
            num_samples=data_cfg.synthetic_num_samples,
            num_leaf_classes=data_cfg.synthetic_num_classes,
            crop_size=data_cfg.crop_size,
            hierarchical=hierarchical,
            seed=config.seed,
        )
        tree_dists = None
        if not config.is_train:
            labels = [
                hierarchy.HierarchicalLabel.parse(name) for name in dataset.classes
            ]
            tree_dists = hierarchy.tree_dist_matrix(labels)
        return dataset, folder_lib.DatasetInfo(dataset.num_classes, tree_dists)

    path = config.machine.datasets[data_cfg.path]
    dataset = folder_lib.scan_image_folder(path, split, hierarchical=hierarchical)
    tree_dists = None
    if not config.is_train:
        tree_dists = hierarchy.build_tree_dist_matrix(path)
    return dataset, folder_lib.DatasetInfo(dataset.num_classes, tree_dists)


def build_transform(config: config_lib.Config, is_train: bool):
    data_cfg = config.train_dataset if is_train else config.eval_dataset
    if is_train:
        ra_depth, ra_sev, colout_p = 0, 9, None
        for algo in config.algorithms:
            if algo.cls == "RandAugment" and not algo.args.get("device", False):
                # device=true RandAugment runs inside the compiled step
                # instead (hvt.data.randaugment via StepSettings.randaugment).
                ra_depth = int(algo.args.get("depth", 1))
                ra_sev = int(algo.args.get("severity", 9))
            elif algo.cls == "ColOut" and not algo.args.get("device", False):
                # device=true ColOut runs inside the compiled step instead
                # (hvt.data.device.colout via StepSettings.colout).
                colout_p = (
                    float(algo.args.get("p_row", 0.05)),
                    float(algo.args.get("p_col", 0.05)),
                )
        return T.TrainTransform(
            crop_size=data_cfg.crop_size,
            resize_size=data_cfg.resize_size,
            randaugment_depth=ra_depth,
            randaugment_severity=ra_sev,
            colout_p=colout_p,
        )
    return T.EvalTransform(crop_size=data_cfg.crop_size, resize_size=data_cfg.resize_size)


def build_loader(
    config: config_lib.Config,
    is_train: bool,
    *,
    process_index: Optional[int] = None,
    process_count: Optional[int] = None,
) -> tuple[Loader, folder_lib.DatasetInfo]:
    """Config → (Loader, DatasetInfo). Global batch is divided across hosts
    (reference main.py:44-48 divides by world size)."""
    import jax

    data_cfg = config.train_dataset if is_train else config.eval_dataset
    pidx = jax.process_index() if process_index is None else process_index
    pcount = jax.process_count() if process_count is None else process_count

    if data_cfg.global_batch_size % pcount:
        raise ValueError(
            f"global_batch_size {data_cfg.global_batch_size} not divisible by "
            f"process count {pcount}"
        )
    local_bs = data_cfg.global_batch_size // pcount

    dataset, info = build_dataset(config, is_train)
    transform = build_transform(config, is_train)
    loader = Loader(
        dataset,
        transform,
        local_bs,
        shuffle=data_cfg.shuffle if is_train else False,
        drop_last=data_cfg.drop_last,
        seed=config.seed,
        num_workers=config.loader.num_workers,
        prefetch_batches=config.loader.prefetch_batches,
        process_index=pidx,
        process_count=pcount,
    )
    return loader, info
