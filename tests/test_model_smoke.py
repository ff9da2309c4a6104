"""End-to-end smoke tests: tiny config, full train/predict forward."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from upsnet_tpu.config import default_config
from upsnet_tpu.models.upsnet import build_model, forward_predict, forward_train
from upsnet_tpu.ops.anchors import pyramid_anchors

H, W = 64, 64
NUM_CLASSES = 5  # 4 things + bg
NUM_SEG = 7  # 3 stuff + 4 things
NUM_STUFF = 3
G = 4  # max gt instances


@pytest.fixture(scope="module")
def tiny_cfg():
    cfg = default_config()
    cfg = cfg.replace(
        network=dataclasses.replace(
            cfg.network,
            backbone="resnet_test",  # 1 block/stage: compile time on CPU
            fpn_feature_dim=32,
            rcnn_fc_dim=64,
            fcn_head_dim=16,
            compute_dtype="float32",
        ),
        dataset=dataclasses.replace(
            cfg.dataset,
            num_classes=NUM_CLASSES,
            num_seg_classes=NUM_SEG,
            num_stuff=NUM_STUFF,
        ),
        train=dataclasses.replace(
            cfg.train,
            rpn_pre_nms_top_n=64,
            rpn_post_nms_top_n=32,
            rpn_batch_size=32,
            batch_rois=16,
            max_gt_instances=G,
        ),
        test=dataclasses.replace(
            cfg.test,
            rpn_pre_nms_top_n=64,
            rpn_post_nms_top_n=32,
            max_det=8,
        ),
    )
    return cfg


@pytest.fixture(scope="module")
def tiny_model_and_params(tiny_cfg):
    model = build_model(tiny_cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)))["params"]
    return model, params


def make_batch(rng, bsz=2):
    images = rng.randn(bsz, H, W, 3).astype(np.float32) * 10
    im_hw = np.tile(np.array([[H, W]], np.float32), (bsz, 1))
    gt_boxes = np.zeros((bsz, G, 4), np.float32)
    gt_classes = np.zeros((bsz, G), np.int32)
    gt_valid = np.zeros((bsz, G), bool)
    gt_masks = np.zeros((bsz, G, H // 4, W // 4), np.float32)
    seg_gt = rng.randint(0, NUM_STUFF, (bsz, H // 4, W // 4)).astype(np.int32)
    for b in range(bsz):
        for i in range(2):
            x1, y1 = rng.randint(0, 30, 2)
            w, h = rng.randint(12, 28, 2)
            gt_boxes[b, i] = [x1, y1, min(x1 + w, W - 1), min(y1 + h, H - 1)]
            gt_classes[b, i] = rng.randint(1, NUM_CLASSES)
            gt_valid[b, i] = True
            q = (gt_boxes[b, i] / 4).astype(int)
            gt_masks[b, i, q[1] : q[3] + 1, q[0] : q[2] + 1] = 1
            seg_gt[b, q[1] : q[3] + 1, q[0] : q[2] + 1] = (
                NUM_STUFF + gt_classes[b, i] - 1
            )
    return {
        "images": jnp.asarray(images),
        "im_hw": jnp.asarray(im_hw),
        "gt_boxes": jnp.asarray(gt_boxes),
        "gt_classes": jnp.asarray(gt_classes),
        "gt_valid": jnp.asarray(gt_valid),
        "gt_masks": jnp.asarray(gt_masks),
        "seg_gt": jnp.asarray(seg_gt),
    }


@pytest.mark.slow
def test_forward_train_losses(tiny_cfg, tiny_model_and_params, rng):
    model, params = tiny_model_and_params
    anchors = tuple(jnp.asarray(a) for a in pyramid_anchors((H, W)))
    batch = make_batch(rng)
    total, losses = forward_train(
        model, params, tiny_cfg, anchors, batch, jax.random.PRNGKey(42)
    )
    assert np.isfinite(float(total))
    assert set(losses) == {"rpn_cls", "rpn_bbox", "cls", "bbox", "mask", "seg", "pano"}
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
        assert float(v) >= 0, k
    # NOTE: magnitudes are meaningless at random init — frozen-BN affines
    # start as identity so activations grow ~2x per residual block; real
    # runs always load converted pretrained stats. Finiteness is the test.


@pytest.mark.slow
def test_forward_train_grads(tiny_cfg, tiny_model_and_params, rng):
    model, params = tiny_model_and_params
    anchors = tuple(jnp.asarray(a) for a in pyramid_anchors((H, W)))
    batch = make_batch(rng, bsz=1)

    def loss_fn(p):
        total, _ = forward_train(
            model, p, tiny_cfg, anchors, batch, jax.random.PRNGKey(0)
        )
        return total

    grads = jax.grad(loss_fn)(params)
    flat = jax.tree.leaves(jax.tree.map(lambda g: float(jnp.abs(g).sum()), grads))
    assert all(np.isfinite(flat))
    assert sum(flat) > 0
    # semantic head weights receive gradient (deform conv path)
    g_fcn = grads["fcn_head"]
    assert float(jax.tree.reduce(lambda a, b: a + jnp.abs(b).sum(), g_fcn, 0.0)) > 0


@pytest.mark.slow
def test_forward_predict_outputs(tiny_cfg, tiny_model_and_params, rng):
    model, params = tiny_model_and_params
    anchors = tuple(jnp.asarray(a) for a in pyramid_anchors((H, W)))
    batch = make_batch(rng)
    out = forward_predict(model, params, tiny_cfg, anchors, batch)
    b = 2
    d = tiny_cfg.test.max_det
    assert out["boxes"].shape == (b, d, 4)
    assert out["scores"].shape == (b, d)
    assert out["classes"].shape == (b, d)
    assert out["mask_logits"].shape == (b, d, 28, 28)
    assert out["seg_logits"].shape == (b, H // 4, W // 4, NUM_SEG)
    assert out["pan_map"].shape == (b, H // 4, W // 4)
    pan = np.asarray(out["pan_map"])
    assert pan.min() >= 0 and pan.max() <= NUM_STUFF + d  # stuff+inst+unknown
    # all finite
    for k in ("boxes", "mask_logits", "seg_logits"):
        assert np.all(np.isfinite(np.asarray(out[k]))), k


@pytest.mark.slow
def test_remat_policy_save_dcn_matches_plain_remat(
    tiny_cfg, tiny_model_and_params, rng
):
    """train.remat_policy='save_dcn' (save named DeformConv outputs across
    the extract remat boundary) must be a pure scheduling change: losses
    and gradients identical to plain full remat and to no remat."""
    model, params = tiny_model_and_params
    anchors = tuple(jnp.asarray(a) for a in pyramid_anchors((H, W)))
    batch = make_batch(rng)
    key = jax.random.PRNGKey(7)

    def grads_for(remat, policy):
        cfg = tiny_cfg.replace(
            train=dataclasses.replace(
                tiny_cfg.train, remat=remat, remat_policy=policy
            )
        )

        def loss_fn(p):
            total, _ = forward_train(model, p, cfg, anchors, batch, key)
            return total

        return jax.value_and_grad(loss_fn)(params)

    t_sd, g_sd = grads_for(True, "save_dcn")
    t_plain, g_plain = grads_for(True, "")
    t_none, g_none = grads_for(False, "")
    assert float(t_sd) == float(t_plain) == float(t_none)
    for ga, gb in ((g_plain, g_sd), (g_none, g_sd)):
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6
            ),
            ga, gb,
        )
