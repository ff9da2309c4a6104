"""Wire-format (data/wire.py) exactness + prefetcher tests.

The compact host->device batch encoding must be EXACT at the point of
consumption: bit-packed masks and uint8 seg labels round-trip bitwise;
bf16 images equal the on-device astype(bf16) the model stem performs
anyway (models/resnet.py:89). The integration test proves a full train
step produces identical metrics and parameters from a raw batch and its
wire encoding.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from upsnet_tpu.config import default_config
from upsnet_tpu.data.wire import (
    DevicePrefetcher,
    decode_batch,
    encode_batch,
)


def test_mask_bits_roundtrip_exact():
    rng = np.random.RandomState(0)
    masks = (rng.rand(3, 5, 12, 40) > 0.5).astype(np.uint8)
    enc = encode_batch({"gt_masks": masks})
    assert "gt_masks" not in enc
    assert enc["gt_masks_bits"].shape == (3, 5, 12, 5)
    dec = jax.jit(decode_batch)({k: jnp.asarray(v) for k, v in enc.items()})
    np.testing.assert_array_equal(np.asarray(dec["gt_masks"]), masks)


def test_mask_bits_float_input_and_odd_width():
    # float 0/1 masks (the collate dtype in some paths) pack exactly
    masks = (np.random.RandomState(1).rand(2, 3, 8, 16) > 0.3).astype(
        np.float32)
    dec = decode_batch(encode_batch({"gt_masks": masks}))
    np.testing.assert_array_equal(np.asarray(dec["gt_masks"]), masks)
    # widths not divisible by 8 are sent raw, not mangled
    odd = (np.random.RandomState(2).rand(2, 3, 8, 13) > 0.5).astype(np.uint8)
    enc = encode_batch({"gt_masks": odd})
    assert "gt_masks_bits" not in enc
    np.testing.assert_array_equal(enc["gt_masks"], odd)


def test_seg_uint8_roundtrip_with_ignore():
    seg = np.random.RandomState(0).randint(0, 134, (2, 16, 24)).astype(
        np.int32)
    seg[0, :2] = 255  # ignore label survives
    dec = decode_batch(
        {k: jnp.asarray(v) for k, v in encode_batch({"seg_gt": seg}).items()}
    )
    assert dec["seg_gt"].dtype == jnp.int32
    np.testing.assert_array_equal(np.asarray(dec["seg_gt"]), seg)


def test_images_bf16_equals_device_cast():
    imgs = np.random.RandomState(0).randn(2, 8, 8, 3).astype(np.float32) * 120
    enc = encode_batch({"images": imgs}, compute_dtype="bfloat16")
    assert enc["images"].dtype.name == "bfloat16"
    np.testing.assert_array_equal(
        np.asarray(jnp.asarray(enc["images"])),
        np.asarray(jnp.asarray(imgs).astype(jnp.bfloat16)),
    )
    # f32-compute configs keep f32 images
    assert encode_batch({"images": imgs}, "float32")["images"].dtype == (
        np.float32)


def test_images_uint8_wire():
    """uint8 image wire: integral pixels (resize scale 1.0) round-trip
    exactly; fractional ones land within 0.5 pixel; padding zeros decode
    to round(mean) - mean (arbitrary-pad territory, documented)."""
    from upsnet_tpu.data.transforms import PIXEL_MEANS_BGR

    rng = np.random.RandomState(0)
    pix = rng.randint(0, 256, (2, 8, 8, 3)).astype(np.float32)
    normed = pix - PIXEL_MEANS_BGR
    enc = encode_batch({"images": normed}, image_wire="uint8")
    assert enc["images"].dtype == np.uint8
    dec = jax.jit(decode_batch)({k: jnp.asarray(v) for k, v in enc.items()})
    assert dec["images"].dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(dec["images"]), normed, atol=1e-4)

    frac = normed + rng.uniform(-0.49, 0.49, normed.shape).astype(np.float32)
    dec2 = decode_batch(
        {k: jnp.asarray(v)
         for k, v in encode_batch({"images": frac},
                                  image_wire="uint8").items()})
    assert np.max(np.abs(np.asarray(dec2["images"]) - frac)) <= 0.5 + 1e-4

    pad = np.zeros((1, 4, 4, 3), np.float32)
    dec3 = decode_batch(encode_batch({"images": pad}, image_wire="uint8"))
    assert np.max(np.abs(np.asarray(dec3["images"]))) <= 0.5


def test_train_step_wire_equivalence():
    """One full train step from a raw batch == from its wire encoding.

    Every encoding in play is exact (tiny f32-compute config: images stay
    f32; masks/labels round-trip bitwise), but the in-program decode
    changes XLA's fusion schedule, which reassociates reductions — the
    measured deviation is one ULP on a single loss term (pano CE: 2.4e-7
    rel), so the comparison is ULP-scale allclose, not bitwise."""
    from tests.test_parallel import make_batch, tiny_cfg
    from upsnet_tpu.models.upsnet import build_model
    from upsnet_tpu.ops.anchors import pyramid_anchors
    from upsnet_tpu.parallel.steps import make_train_step
    from upsnet_tpu.train.optimizer import make_optimizer

    cfg = tiny_cfg()
    H, W = cfg.train.image_buckets[0]
    model = build_model(cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, H, W, 3)))["params"]
    opt = make_optimizer(cfg, params)
    anchors = tuple(jnp.asarray(a) for a in pyramid_anchors((H, W)))
    step = make_train_step(model, cfg, anchors, opt)
    batch = make_batch(2)
    key = jax.random.PRNGKey(7)
    # the step donates params/opt_state: stage through numpy so each call
    # gets fresh device buffers
    params_np = jax.tree.map(np.asarray, params)
    fresh = lambda: jax.tree.map(jnp.asarray, params_np)

    p1, _, m1 = step(fresh(), opt.init(fresh()),
                     {k: jnp.asarray(v) for k, v in batch.items()}, key)
    wire = encode_batch(dict(batch), cfg.network.compute_dtype)
    p2, _, m2 = step(fresh(), opt.init(fresh()),
                     {k: jnp.asarray(v) for k, v in wire.items()}, key)

    for k in m1:
        np.testing.assert_allclose(
            np.asarray(m1[k]), np.asarray(m2[k]), rtol=1e-6, err_msg=k)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-8), p1, p2)


def test_prefetcher_order_and_exhaustion():
    src = iter(range(7))
    pf = DevicePrefetcher(src, lambda x: x * 10, depth=2)
    assert list(pf) == [0, 10, 20, 30, 40, 50, 60]


def test_prefetcher_propagates_errors():
    def bad_put(x):
        if x == 2:
            raise ValueError("boom")
        return x

    pf = DevicePrefetcher(iter(range(5)), bad_put, depth=2)
    assert next(pf) == 0
    assert next(pf) == 1
    with pytest.raises(ValueError, match="boom"):
        # items after the failure are never produced
        for _ in pf:
            pass
