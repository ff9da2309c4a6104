"""Data-parallel mesh tests on the 8-device virtual CPU mesh (SURVEY.md §4)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from upsnet_tpu.config import default_config
from upsnet_tpu.models.upsnet import build_model
from upsnet_tpu.ops.anchors import pyramid_anchors
from upsnet_tpu.parallel.mesh import batch_sharding, make_mesh, shard_batch
from upsnet_tpu.parallel.steps import make_train_step
from upsnet_tpu.train.optimizer import make_optimizer

H = W = 64
G = 4


def tiny_cfg():
    cfg = default_config()
    return cfg.replace(
        network=dataclasses.replace(
            cfg.network, backbone="resnet_test", fpn_feature_dim=32,
            rcnn_fc_dim=64, fcn_head_dim=16, compute_dtype="float32",
        ),
        dataset=dataclasses.replace(
            cfg.dataset, num_classes=5, num_seg_classes=7, num_stuff=3
        ),
        train=dataclasses.replace(
            cfg.train, rpn_pre_nms_top_n=64, rpn_post_nms_top_n=32,
            rpn_batch_size=32, batch_rois=16, max_gt_instances=G,
            image_buckets=((H, W),),
        ),
    )


def make_batch(b):
    rng = np.random.RandomState(0)
    return {
        "images": rng.randn(b, H, W, 3).astype(np.float32),
        "im_hw": np.tile(np.array([[H, W]], np.float32), (b, 1)),
        "gt_boxes": np.tile(
            np.array([[[4, 4, 30, 30], [20, 20, 50, 50], [0, 0, 0, 0],
                       [0, 0, 0, 0]]], np.float32), (b, 1, 1)),
        "gt_classes": np.tile(np.array([[1, 2, 0, 0]], np.int32), (b, 1)),
        "gt_valid": np.tile(np.array([[True, True, False, False]]), (b, 1)),
        "gt_masks": (rng.rand(b, G, H // 4, W // 4) > 0.7).astype(np.float32),
        "seg_gt": rng.randint(0, 3, (b, H // 4, W // 4)).astype(np.int32),
    }


def test_mesh_has_8_devices():
    assert jax.device_count() == 8


@pytest.mark.slow
def test_dp_train_step_runs_and_replicates():
    cfg = tiny_cfg()
    mesh = make_mesh(8)
    model = build_model(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)))["params"]
    opt = make_optimizer(cfg, params)
    ost = opt.init(params)
    anchors = tuple(jnp.asarray(a) for a in pyramid_anchors((H, W)))
    step = make_train_step(model, cfg, anchors, opt, mesh)
    batch = shard_batch(mesh, make_batch(8))
    # batch really is split over the data axis
    sh = batch["images"].sharding
    assert sh.is_equivalent_to(batch_sharding(mesh), ndim=4)
    p2, o2, metrics = step(params, ost, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["total"]))
    # updated params are replicated (no per-device divergence)
    leaf = jax.tree.leaves(p2)[0]
    assert leaf.sharding.is_fully_replicated


@pytest.mark.slow
def test_dp_matches_single_device_loss():
    """Mesh loss on a replicated batch == single-device loss on one shard."""
    cfg = tiny_cfg()
    model = build_model(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)))["params"]
    opt = make_optimizer(cfg, params)
    ost = opt.init(params)
    anchors = tuple(jnp.asarray(a) for a in pyramid_anchors((H, W)))

    # same image replicated 8x: per-image losses identical, mean = single
    b1 = make_batch(1)
    b8 = {k: np.repeat(v, 8, axis=0) for k, v in b1.items()}

    step1 = make_train_step(model, cfg, anchors, opt, None)
    mesh = make_mesh(8)
    step8 = make_train_step(model, cfg, anchors, opt, mesh)

    # fold_in per-image keys differ across batch slots, so fix randomness by
    # comparing the loss metric computed from identical per-slot keys is not
    # possible; instead check that the DP step produces finite, close loss.
    # NOTE: the train step donates params/opt_state — pass fresh copies.
    p1, o1 = jax.tree.map(jnp.copy, (params, ost))
    _, _, m1 = step1(p1, o1, {k: jnp.asarray(v) for k, v in b1.items()},
                     jax.random.PRNGKey(5))
    _, _, m8 = step8(params, ost, shard_batch(mesh, b8), jax.random.PRNGKey(5))
    assert np.isfinite(float(m1["total"])) and np.isfinite(float(m8["total"]))
    # seg loss has no sampling randomness -> must match across DP replicas
    np.testing.assert_allclose(float(m1["seg"]), float(m8["seg"]), rtol=1e-4)
