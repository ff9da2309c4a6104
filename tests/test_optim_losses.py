import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from upsnet_tpu.config import default_config
from upsnet_tpu.train import losses as L
from upsnet_tpu.train.optimizer import lr_schedule, make_optimizer


def test_lr_schedule_warmup_and_decay():
    cfg = default_config()
    cfg = cfg.replace(train=dataclasses.replace(
        cfg.train, lr=0.02, warmup_iteration=100, warmup_factor=1 / 3,
        decay_iteration=(1000, 2000), decay_factor=0.1))
    s = lr_schedule(cfg)
    np.testing.assert_allclose(float(s(0)), 0.02 / 3, rtol=1e-6)
    np.testing.assert_allclose(float(s(100)), 0.02, rtol=1e-6)
    np.testing.assert_allclose(float(s(999)), 0.02, rtol=1e-6)
    np.testing.assert_allclose(float(s(1000)), 0.002, rtol=1e-6)
    np.testing.assert_allclose(float(s(2500)), 0.0002, rtol=1e-6)


def test_optimizer_freezes_and_bias_rules():
    cfg = default_config()
    params = {
        "backbone_net": {
            "conv1": {"kernel": jnp.ones((3, 3, 3, 8))},
            "bn1": {"scale": jnp.ones(8), "bias": jnp.zeros(8)},
            "res2_0": {"conv1": {"kernel": jnp.ones((1, 1, 8, 8))}},
            "res3_0": {"conv1": {"kernel": jnp.ones((1, 1, 8, 8))},
                       "bn1": {"scale": jnp.ones(8), "bias": jnp.zeros(8)}},
        },
        "rpn": {"conv": {"kernel": jnp.ones((3, 3, 8, 8)),
                         "bias": jnp.zeros(8)}},
    }
    tx = make_optimizer(cfg, params)
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    # frozen: conv1, res2, every BN affine
    assert float(jnp.abs(updates["backbone_net"]["conv1"]["kernel"]).sum()) == 0
    assert float(jnp.abs(updates["backbone_net"]["res2_0"]["conv1"]["kernel"]).sum()) == 0
    assert float(jnp.abs(updates["backbone_net"]["res3_0"]["bn1"]["scale"]).sum()) == 0
    # trainable: res3 conv, rpn
    assert float(jnp.abs(updates["backbone_net"]["res3_0"]["conv1"]["kernel"]).sum()) > 0
    w_up = updates["rpn"]["conv"]["kernel"]
    b_up = updates["rpn"]["conv"]["bias"]
    # bias gets 2x LR and no weight decay: with unit grads and wd on weights,
    # |bias update| ~= 2 * |weight update net of wd|
    lr0 = float(lr_schedule(cfg)(0))
    np.testing.assert_allclose(float(-b_up[0]), 2 * lr0, rtol=1e-5)
    np.testing.assert_allclose(
        float(-w_up[0, 0, 0, 0]), lr0 * (1 + cfg.train.wd), rtol=1e-4
    )


def test_optimizer_offset_lr_mult():
    """DCN offset convs form their own param group (VERDICT r3 #1a): both
    kernel AND bias scale with train.dcn_offset_lr_mult (no 2x-bias rule —
    that would amplify the from-scratch offset runaway), and the kernel
    keeps weight decay (the restoring force toward zero offsets)."""
    cfg = default_config()
    cfg = cfg.replace(train=dataclasses.replace(
        cfg.train, dcn_offset_lr_mult=0.1, grad_clip=0.0))
    params = {
        "fcn_head": {
            "dcn1": {"offset_conv": {"kernel": jnp.ones((3, 3, 8, 18)),
                                     "bias": jnp.zeros(18)},
                     "conv": {"kernel": jnp.ones((3, 3, 8, 8)),
                              "bias": jnp.zeros(8)}},
        },
    }
    tx = make_optimizer(cfg, params)
    updates, _ = tx.update(
        jax.tree.map(jnp.ones_like, params), tx.init(params), params)
    lr0 = float(lr_schedule(cfg)(0))
    off = updates["fcn_head"]["dcn1"]["offset_conv"]
    np.testing.assert_allclose(
        float(-off["kernel"][0, 0, 0, 0]), 0.1 * lr0 * (1 + cfg.train.wd),
        rtol=1e-4)
    np.testing.assert_allclose(float(-off["bias"][0]), 0.1 * lr0, rtol=1e-4)
    # sibling plain conv unaffected
    np.testing.assert_allclose(
        float(-updates["fcn_head"]["dcn1"]["conv"]["bias"][0]), 2 * lr0,
        rtol=1e-4)


def test_smooth_l1_regions():
    p = jnp.asarray([0.0, 0.05, 2.0])
    t = jnp.zeros(3)
    out = np.asarray(L.smooth_l1(p, t, beta=1.0 / 9.0))
    np.testing.assert_allclose(out[0], 0.0)
    np.testing.assert_allclose(out[1], 0.5 * 0.05**2 / (1 / 9), rtol=1e-5)
    np.testing.assert_allclose(out[2], 2.0 - 0.5 / 9, rtol=1e-5)


def test_softmax_ce_ignores_invalid():
    logits = jnp.asarray([[10.0, 0.0], [0.0, 10.0], [5.0, 5.0]])
    labels = jnp.asarray([0, 1, 0])
    valid = jnp.asarray([True, True, False])
    loss = float(L.softmax_ce(logits, labels, valid))
    assert loss < 1e-3  # both valid rows confidently correct


def test_mask_loss_targets_only_fg():
    r, m, c = 4, 8, 3
    logits = jnp.zeros((r, m, m, c))
    labels = jnp.asarray([1, 2, 0, 1])
    targets = jnp.ones((r, m, m))
    fg = jnp.asarray([True, False, False, False])
    # logits 0 -> BCE = ln 2 per pixel on the single fg roi
    loss = float(L.mask_loss(logits, labels, targets, fg))
    np.testing.assert_allclose(loss, np.log(2), rtol=1e-5)


def test_rcnn_bbox_loss_class_slice():
    r, ncls = 2, 3
    pred = jnp.zeros((r, ncls * 4))
    pred = pred.at[0, 4:8].set(1.0)  # class-1 block of roi 0
    labels = jnp.asarray([1, 2])
    targets = jnp.zeros((r, 4))
    fg = jnp.asarray([True, True])
    valid = jnp.asarray([True, True])
    loss = float(L.rcnn_bbox_loss(pred, labels, targets, fg, valid, beta=1.0))
    # roi0: |1-0| smooth-l1 = 0.5 each over 4 coords; roi1 zero; /2 valid
    np.testing.assert_allclose(loss, 4 * 0.5 / 2, rtol=1e-5)
