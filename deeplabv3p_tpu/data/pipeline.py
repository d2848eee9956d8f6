"""Host-side dataset: decode + resize + prefetch, feeding the device graph.

Replaces the reference's `SegmentationGenerator` keras Sequence
(/root/reference/deeplabv3p/data.py:14-160). Layout convention is
identical: `<dataset>/images/<id>.jpg` + `<dataset>/labels/<id>.png`
(data.py:25-26). The reference decodes, augments (12 PIL/cv2 ops), and
computes sklearn class weights per image in a single Python thread —
the pipeline hot spot (SURVEY.md §3.1). Here the host only:

1. decodes (PIL),
2. optionally applies CLAHE histogram equalization (the one reference op
   whose data-dependent histograms don't map well to TPU; reference
   data_utils.py:127-149, prob 0.2 — note the reference applies it after
   random_crop, we apply it at decode time: photometrically equivalent up
   to crop boundaries),
3. resizes to the model input shape (bilinear image / nearest label,
   reference data.py:110-111),

in a thread pool with double-buffered prefetch; everything else
(flips/warps/GridMask/photometric/normalize/adaptive weights) runs on
device in `deeplabv3p_tpu.data.augment.augment_batch`.
"""

from __future__ import annotations

import concurrent.futures as cf
import os
import queue
import threading
from typing import Iterator

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover - cv2 is present in the image
    cv2 = None

from PIL import Image


def _apply_clahe(image: np.ndarray, grid_size: int = 8) -> np.ndarray:
    """CLAHE on the luma plane (reference random_histeq,
    data_utils.py:127-149 — including its RGB-array-through-BGR2YUV
    channel convention, kept bug-for-bug)."""
    if cv2 is None:
        return image
    clahe = cv2.createCLAHE(clipLimit=2.0, tileGridSize=(grid_size, grid_size))
    img_yuv = cv2.cvtColor(image, cv2.COLOR_BGR2YUV)
    img_yuv[:, :, 0] = clahe.apply(img_yuv[:, :, 0])
    return cv2.cvtColor(img_yuv, cv2.COLOR_YUV2BGR)


def _resize_pair(
    image: np.ndarray, label: np.ndarray, input_shape: tuple[int, int]
) -> tuple[np.ndarray, np.ndarray]:
    h, w = input_shape
    if cv2 is not None:
        image = cv2.resize(image, (w, h))  # INTER_LINEAR (data.py:110)
        label = cv2.resize(label, (w, h), interpolation=cv2.INTER_NEAREST)
    else:
        image = np.asarray(
            Image.fromarray(image).resize((w, h), Image.BILINEAR)
        )
        label = np.asarray(
            Image.fromarray(label).resize((w, h), Image.NEAREST)
        )
    return image, label


class SegmentationDataset:
    """File-list dataset with threaded decode and batch prefetch."""

    def __init__(
        self,
        dataset_path: str,
        data_list: list[str],
        batch_size: int = 1,
        num_classes: int = 21,
        input_shape: tuple[int, int] = (512, 512),
        ignore_index: int = 255,
        augment: bool = True,
        histeq_prob: float = 0.2,
        shuffle: bool = True,
        num_workers: int = 8,
        seed: int = 0,
        drop_remainder: bool = True,
    ):
        dataset_realpath = os.path.realpath(dataset_path)
        self.image_paths = [
            os.path.join(dataset_realpath, "images", i.strip() + ".jpg")
            for i in data_list
        ]
        self.label_paths = [
            os.path.join(dataset_realpath, "labels", i.strip() + ".png")
            for i in data_list
        ]
        self.batch_size = batch_size
        self.num_classes = num_classes
        self.input_shape = tuple(input_shape)
        self.ignore_index = ignore_index
        self.augment = augment
        self.histeq_prob = histeq_prob
        self.shuffle = shuffle
        self.num_workers = num_workers
        # drop_remainder=False pads the final partial batch by repeating
        # its last sample with labels set to ignore (255) — shapes stay
        # static and the padding is excluded from metrics/losses. The
        # reference avoids the problem by evaluating at batch 1
        # (eval.py:380-386); training matches its floor-division drop
        # (data.py:52-53).
        self.drop_remainder = drop_remainder
        self._rng = np.random.RandomState(seed)
        self._order = np.arange(len(self.image_paths))
        # persistent decode pool: per-epoch executor spin-up costs real
        # latency on short epochs
        self._pool = cf.ThreadPoolExecutor(num_workers)

    def __len__(self) -> int:
        n = len(self.image_paths)
        if self.drop_remainder:
            return n // self.batch_size  # reference data.py:52-53
        return -(-n // self.batch_size)

    @property
    def num_samples(self) -> int:
        return len(self.image_paths)

    def _load_sample(self, idx: int):
        # images: cv2 JPEG decode is ~2x faster than PIL (3.0 vs 5.7 ms
        # for a VOC-sized image) — this is the pipeline's hot path.
        # labels: must stay PIL — cv2 expands palette PNGs to RGB colors
        # and loses the class indices.
        if cv2 is not None:
            image = cv2.cvtColor(
                cv2.imread(self.image_paths[idx], cv2.IMREAD_COLOR),
                cv2.COLOR_BGR2RGB,
            )
        else:
            image = np.array(
                Image.open(self.image_paths[idx]).convert("RGB"),
                dtype=np.uint8,
            )
        lbl = Image.open(self.label_paths[idx])
        label = np.array(lbl)
        if label.ndim == 3:  # color label PNGs: take first channel
            label = label[..., 0]
        label = label.astype(np.uint8)
        orig_hw = np.array(image.shape[:2], np.float32)

        if self.augment and self._rng.rand() < self.histeq_prob:
            image = _apply_clahe(image)

        image, label = _resize_pair(image, label, self.input_shape)
        return image, label, orig_hw

    def epoch_batches(
        self, prefetch: int = 2
    ) -> Iterator[tuple[np.ndarray, np.ndarray, np.ndarray]]:
        """Yield (images u8 (B,H,W,3), labels u8 (B,H,W), orig_hw (B,2))
        with background prefetch. Shuffles at epoch start (reference
        shuffles at epoch end, data.py:156-160 — same distribution).

        Sample decodes for up to `prefetch + 1` batches are in flight at
        once (windowed futures over the persistent pool), so decoding of
        batch b+1 overlaps the consumer's device work on batch b.
        """
        order = self._order.copy()
        if self.shuffle:
            self._rng.shuffle(order)
        n_batches = len(self)
        q: queue.Queue = queue.Queue(maxsize=prefetch)
        stop = threading.Event()

        def _put(item) -> bool:
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            window = prefetch + 1
            pending: list[list] = []
            next_submit = 0

            def submit(b):
                idx = order[b * self.batch_size : (b + 1) * self.batch_size]
                return [self._pool.submit(self._load_sample, i) for i in idx]

            while next_submit < min(window, n_batches):
                pending.append(submit(next_submit))
                next_submit += 1
            emitted = 0
            while emitted < n_batches and not stop.is_set():
                futures = pending.pop(0)
                samples = [f.result() for f in futures]
                short = self.batch_size - len(samples)
                if short > 0:
                    # pad the final partial batch: repeat the last sample
                    # with labels forced to 255 so the padding is invisible
                    # to losses and confusion-matrix metrics
                    img, lbl, hw = samples[-1]
                    pad_lbl = np.full_like(lbl, 255)
                    samples = samples + [(img, pad_lbl, hw)] * short
                batch = (
                    np.stack([s[0] for s in samples]),
                    np.stack([s[1] for s in samples]),
                    np.stack([s[2] for s in samples]),
                )
                if not _put(batch):
                    return
                emitted += 1
                if next_submit < n_batches:
                    pending.append(submit(next_submit))
                    next_submit += 1
            _put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                yield item
        finally:
            stop.set()

    def batch_image_paths(self, batch_index: int) -> list[str]:
        """Paths for a (non-shuffled) batch — reference
        get_batch_image_path (data.py:43-44), used by eval result dumps."""
        i = batch_index
        return self.image_paths[i * self.batch_size : (i + 1) * self.batch_size]


class _FeedError:
    def __init__(self, exc: BaseException):
        self.exc = exc


def device_feed(batches, put_fn, depth: int = 2):
    """Background-thread device feeder.

    Wraps a host-batch iterator so that `put_fn(batch)` (device_put /
    jnp.asarray — the host→device transfer) runs in a worker thread up to
    `depth` batches ahead of the consumer. Through the tunneled TPU client
    transfers are effectively synchronous host calls, so staging them off
    the dispatch thread is what lets decode, transfer, and device compute
    overlap (VERDICT r1 item #4: close the host-pipeline gap).

    Yields put_fn's results; exceptions from the worker re-raise in the
    consumer. Closing the generator stops the worker.
    """
    q: queue.Queue = queue.Queue(maxsize=depth)
    stop = threading.Event()
    sentinel = object()

    def _put(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for batch in batches:
                if not _put(put_fn(batch)):
                    return
        except BaseException as e:  # propagate to consumer
            _put(_FeedError(e))
            return
        _put(sentinel)

    thread = threading.Thread(target=worker, daemon=True, name="device-feed")
    thread.start()
    try:
        while True:
            item = q.get()
            if item is sentinel:
                return
            if isinstance(item, _FeedError):
                raise item.exc
            yield item
    finally:
        stop.set()
