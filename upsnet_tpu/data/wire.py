"""Compact host->device wire format for batches + async device prefetch.

Why this exists: at the flagship shape (b8, 832x1344, 100 gt slots) a raw
f32 training batch is ~165 MB. The r4 rehearsal telemetry (metrics.jsonl:
platform=tpu, loader_wait ~0.1 s) showed the trainer loop at 7.36 s/step
while the jitted step alone is 1.27 s — the missing ~6 s/step was the
SYNCHRONOUS host->device copy of that batch, serialized with the step.
The reference never sees this cost class (pinned host memory + PCIe hides
165 MB; `upsnet/upsnet_end2end_train.py`'s loader, SURVEY.md §3.1); on a
TPU front-end the copy is a first-class bottleneck, so the input pipeline
(a) sends information, not padding, and (b) overlaps the copy with the
previous step via :class:`DevicePrefetcher`.

Wire encodings (``encode_batch``, host/numpy) and their exactness:

  images    f32 -> bf16    BIT-IDENTICAL downstream when the model computes
                           in bf16: the stem's first op is
                           astype(compute_dtype) (models/resnet.py:89), and
                           numpy's f32->bf16 round-to-nearest-even equals
                           the on-device cast. Skipped for f32-compute
                           configs (e.g. the tiny tests config).
  images    f32 -> uint8   (``image_wire='uint8'``, the trainer default)
                           stores round(normalized + caffe_mean) — i.e.
                           the resized image re-encoded as ordinary 8-bit
                           pixels, exactly what any on-disk image format
                           holds; decode subtracts the mean in f32
                           on-device. Lossless when the resize scale is
                           1.0 (pixels stay integral); otherwise the
                           bilinear resize's fractional part rounds
                           (|err| <= 0.5 of a 0..255 pixel). Bucket
                           padding (0.0 after normalization) encodes to
                           round(mean) and decodes ~0.02 off zero —
                           arbitrary-pad territory. Halves the dominant
                           wire term (b8 flagship images: 53.7 MB bf16 ->
                           26.8 MB).
  gt_masks  {0,1} uint8 -> bit-packed uint8 along W (np.packbits, 8x,
                           exactly invertible; W is always a multiple of 8
                           because buckets are multiples of 32 and masks
                           live at 1/4 scale).
  seg_gt    int32 -> uint8 exact: labels < 254 (COCO panoptic has 133 seg
                           classes; Cityscapes 19) and the ignore label is
                           already 255 (train/losses.py:83).

``decode_batch`` is traceable jnp and runs INSIDE the jitted train step
(parallel/steps.py), so the unpack is VPU work fused into the program —
never a second host round-trip. Raw (un-encoded) batches pass through both
functions unchanged, so every existing caller (bench.py, tests, the
multi-chip dryrun) keeps working with full-precision batches.
"""

from __future__ import annotations

import queue
import threading

import numpy as np

# keys a training step consumes; everything else (image_id, orig_hw, ...)
# is host-side bookkeeping and never crosses the wire
STEP_KEYS = (
    "images", "im_hw", "gt_boxes", "gt_classes", "gt_valid", "gt_masks",
    "gt_masks_bits", "seg_gt", "crowd_boxes", "crowd_valid",
)


def encode_batch(batch: dict, compute_dtype: str = "bfloat16",
                 image_wire: str = "bf16") -> dict:
    """Numpy batch -> compact wire batch (see module docstring)."""
    out = dict(batch)
    imgs = out.get("images")
    if imgs is not None and imgs.dtype == np.float32:
        if image_wire == "uint8":
            from upsnet_tpu.data.transforms import PIXEL_MEANS_BGR

            out["images"] = np.clip(
                np.rint(imgs + PIXEL_MEANS_BGR), 0, 255
            ).astype(np.uint8)
        elif compute_dtype == "bfloat16":
            import ml_dtypes

            out["images"] = np.asarray(imgs, dtype=ml_dtypes.bfloat16)
    masks = out.pop("gt_masks", None)
    if masks is not None:
        if masks.shape[-1] % 8:
            out["gt_masks"] = masks  # odd width: send raw (never for
            # bucketed training shapes — buckets are multiples of 32)
        else:
            out["gt_masks_bits"] = np.packbits(
                masks.astype(bool), axis=-1)
    seg = out.get("seg_gt")
    if seg is not None and seg.dtype != np.uint8:
        out["seg_gt"] = seg.astype(np.uint8)  # labels <= 133, ignore = 255
    return out


def decode_batch(batch: dict) -> dict:
    """Wire batch -> model batch; traceable, pass-through on raw batches."""
    import jax.numpy as jnp

    out = dict(batch)
    imgs = out.get("images")
    if imgs is not None and imgs.dtype == jnp.uint8:
        from upsnet_tpu.data.transforms import PIXEL_MEANS_BGR

        out["images"] = imgs.astype(jnp.float32) - jnp.asarray(
            PIXEL_MEANS_BGR, jnp.float32)
    bits = out.pop("gt_masks_bits", None)
    if bits is not None:
        # inverse of np.packbits(axis=-1): MSB-first within each byte
        shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)
        m = (bits[..., None] >> shifts) & jnp.uint8(1)
        out["gt_masks"] = m.reshape(*bits.shape[:-1], bits.shape[-1] * 8)
    seg = out.get("seg_gt")
    if seg is not None and seg.dtype == jnp.uint8:
        out["seg_gt"] = seg.astype(jnp.int32)
    return out


class DevicePrefetcher:
    """Runs ``put`` (encode + jax.device_put / shard_batch) on a background
    thread ``depth`` batches ahead of the consumer, so the host->device
    copy of batch N+1 overlaps the device step on batch N. Exceptions from
    the source iterator or ``put`` re-raise at the consuming ``next()``."""

    _DONE = object()

    def __init__(self, it, put, depth: int = 2):
        self._q: queue.Queue = queue.Queue(maxsize=max(1, depth))
        self._stop = threading.Event()
        self._thread = threading.Thread(
            target=self._run, args=(it, put), daemon=True)
        self._thread.start()

    def _put_or_stop(self, item) -> bool:
        """Enqueue, but wake up if close() is called while the queue is
        full (the consumer exited early and will never drain us)."""
        while not self._stop.is_set():
            try:
                self._q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def _run(self, it, put):
        try:
            for item in it:
                if self._stop.is_set():
                    return
                if not self._put_or_stop(put(item)):
                    return
        except BaseException as e:  # noqa: BLE001 - propagate to consumer
            self._put_or_stop(e)
            return
        self._put_or_stop(self._DONE)

    def close(self):
        """Stop the producer thread and release its staged device batches.
        Without this, a consumer that exits early (max_steps break, the
        saturation watch raising) leaves the daemon thread blocked on
        q.put holding encoded batches — and the loader's forked worker
        processes pinned — for the life of the process (ADVICE r4)."""
        self._stop.set()
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=10.0)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._DONE:
            raise StopIteration
        if isinstance(item, BaseException):
            raise item
        return item
