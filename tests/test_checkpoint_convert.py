"""Checkpoint roundtrip + torch converter tests."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from upsnet_tpu.config import default_config
from upsnet_tpu.convert.torch_converter import (
    _fold_bn,
    conv_w,
    deform_w,
    dense_w,
    torchvision_resnet_to_backbone,
)
from upsnet_tpu.train.checkpoints import (
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)


def test_checkpoint_roundtrip(tmp_path):
    params = {"a": jnp.arange(6.0).reshape(2, 3), "b": {"c": jnp.ones(4)}}
    opt_state = {"m": jnp.zeros(3)}
    path = save_checkpoint(str(tmp_path / "ck"), 42, params, opt_state)
    assert latest_checkpoint(str(tmp_path / "ck")) == path
    state = restore_checkpoint(
        path, {"params": params, "opt_state": opt_state,
               "iteration": jnp.asarray(0)}
    )
    assert int(state["iteration"]) == 42
    np.testing.assert_array_equal(np.asarray(state["params"]["a"]),
                                  np.asarray(params["a"]))
    partial = restore_checkpoint(path, None, partial=True)
    np.testing.assert_array_equal(np.asarray(partial["params"]["b"]["c"]),
                                  np.ones(4))
    # partial + template validates the named subtree
    ok = restore_checkpoint(path, {"params": params}, partial=True)
    np.testing.assert_array_equal(np.asarray(ok["params"]["a"]),
                                  np.asarray(params["a"]))


def test_partial_restore_names_the_mismatch(tmp_path):
    """A config/checkpoint mismatch must fail AT RESTORE with a named key
    diff (VERDICT r2 weak #6), not later inside model.apply."""
    import pytest

    from upsnet_tpu.train.checkpoints import CheckpointMismatch

    params = {"a": jnp.arange(6.0).reshape(2, 3), "b": {"c": jnp.ones(4)}}
    path = save_checkpoint(str(tmp_path / "ck"), 1, params, {"m": jnp.zeros(3)})

    bad = {"a": jnp.zeros((2, 3)), "b": {"c": jnp.ones(5)},  # shape diff
           "extra": jnp.zeros(2)}  # missing from checkpoint
    with pytest.raises(CheckpointMismatch) as ei:
        restore_checkpoint(path, {"params": bad}, partial=True)
    msg = str(ei.value)
    assert "missing from checkpoint" in msg and "extra" in msg
    assert "shape mismatch" in msg and "b/c" in msg
    # and the absence of a subtree is named too
    with pytest.raises(CheckpointMismatch, match="missing from checkpoint"):
        restore_checkpoint(path, {"nope": {"x": jnp.zeros(1)}}, partial=True)


def test_bn_folding():
    gamma = np.array([2.0, 1.0])
    beta = np.array([0.5, -1.0])
    mean = np.array([1.0, 3.0])
    var = np.array([4.0, 0.25])
    scale, bias = _fold_bn(gamma, beta, mean, var, eps=0.0)
    x = np.array([[3.0, 5.0]])
    expected = gamma * (x - mean) / np.sqrt(var) + beta
    np.testing.assert_allclose(x * scale + bias, expected, rtol=1e-6)


def test_layout_transposes(rng):
    t = rng.randn(8, 4, 3, 3).astype(np.float32)  # OIHW
    w = conv_w(t)
    assert w.shape == (3, 3, 4, 8)  # HWIO
    np.testing.assert_allclose(w[1, 2, 3, 5], t[5, 3, 1, 2])
    d = rng.randn(16, 4).astype(np.float32)
    assert dense_w(d).shape == (4, 16)
    dw = deform_w(t)
    assert dw.shape == (9, 4, 8)
    np.testing.assert_allclose(dw[4, 2, 1], t[1, 2, 1, 1])  # tap 4 = (1,1)


def _fake_torchvision_state(depth="resnet50", rng=None):
    import torch

    rng = rng or np.random.RandomState(0)
    blocks = {"resnet50": (3, 4, 6, 3)}[depth]
    state = {}

    def add_bn(prefix, c):
        state[f"{prefix}.weight"] = torch.tensor(rng.rand(c).astype(np.float32) + 0.5)
        state[f"{prefix}.bias"] = torch.tensor(rng.randn(c).astype(np.float32))
        state[f"{prefix}.running_mean"] = torch.tensor(rng.randn(c).astype(np.float32))
        state[f"{prefix}.running_var"] = torch.tensor(rng.rand(c).astype(np.float32) + 0.5)

    state["conv1.weight"] = torch.tensor(rng.randn(64, 3, 7, 7).astype(np.float32))
    add_bn("bn1", 64)
    in_c = 64
    for si, (n, width) in enumerate(zip(blocks, (64, 128, 256, 512)), 1):
        for bi in range(n):
            p = f"layer{si}.{bi}"
            state[f"{p}.conv1.weight"] = torch.tensor(
                rng.randn(width, in_c if bi == 0 else width * 4, 1, 1).astype(np.float32))
            add_bn(f"{p}.bn1", width)
            state[f"{p}.conv2.weight"] = torch.tensor(
                rng.randn(width, width, 3, 3).astype(np.float32))
            add_bn(f"{p}.bn2", width)
            state[f"{p}.conv3.weight"] = torch.tensor(
                rng.randn(width * 4, width, 1, 1).astype(np.float32))
            add_bn(f"{p}.bn3", width * 4)
            if bi == 0:
                state[f"{p}.downsample.0.weight"] = torch.tensor(
                    rng.randn(width * 4, in_c, 1, 1).astype(np.float32))
                add_bn(f"{p}.downsample.1", width * 4)
        in_c = width * 4
    return state


def test_torchvision_conversion_loads_into_model(tmp_path):
    import torch

    state = _fake_torchvision_state()
    backbone = torchvision_resnet_to_backbone(
        {k: v.numpy() for k, v in state.items()}, "resnet50"
    )
    # structure: conv1 + bn1 + 16 blocks
    assert "res2_0" in backbone and "res5_2" in backbone
    assert backbone["res3_0"]["shortcut_conv"]["kernel"].shape == (1, 1, 256, 512)

    cfg = default_config()
    cfg = cfg.replace(network=dataclasses.replace(
        cfg.network, fpn_feature_dim=16, rcnn_fc_dim=32, fcn_head_dim=16,
        compute_dtype="float32"))
    from upsnet_tpu.models.upsnet import build_model

    model = build_model(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))["params"]

    # every converted leaf shape must match the initialized tree
    conv_leaves = jax.tree.leaves_with_path(backbone)
    tgt_tree = params["backbone_net"]
    for path, arr in conv_leaves:
        tgt = tgt_tree
        for k in path:
            tgt = tgt[k.key]
        assert tgt.shape == arr.shape, (path, tgt.shape, arr.shape)

    # end-to-end via load_pretrained on a saved .pth
    torch.save(state, tmp_path / "r50.pth")
    from upsnet_tpu.convert.torch_converter import load_pretrained

    merged = load_pretrained(str(tmp_path / "r50.pth"), params)
    got = np.asarray(merged["backbone_net"]["conv1"]["kernel"])
    np.testing.assert_allclose(
        got, conv_w(state["conv1.weight"].numpy()), rtol=1e-6
    )


def test_coco_to_cityscapes_remap():
    from upsnet_tpu.convert.finetune import remap_coco_params_to_cityscapes

    rng = np.random.RandomState(0)
    coco = {
        "backbone_net": {"conv1": {"kernel": rng.randn(7, 7, 3, 64).astype(np.float32)}},
        "box_head": {
            "cls_score": {"kernel": rng.randn(32, 81).astype(np.float32),
                          "bias": rng.randn(81).astype(np.float32)},
            "bbox_pred": {"kernel": rng.randn(32, 324).astype(np.float32),
                          "bias": rng.randn(324).astype(np.float32)},
        },
        "mask_head": {"mask_score": {
            "kernel": rng.randn(1, 1, 8, 81).astype(np.float32),
            "bias": rng.randn(81).astype(np.float32)}},
        "fcn_head": {"score": {
            "kernel": rng.randn(1, 1, 16, 133).astype(np.float32),
            "bias": rng.randn(133).astype(np.float32)}},
    }
    city = {
        "backbone_net": {"conv1": {"kernel": np.zeros((7, 7, 3, 64), np.float32)}},
        "box_head": {
            "cls_score": {"kernel": np.zeros((32, 9), np.float32),
                          "bias": np.zeros(9, np.float32)},
            "bbox_pred": {"kernel": np.zeros((32, 36), np.float32),
                          "bias": np.zeros(36, np.float32)},
        },
        "mask_head": {"mask_score": {
            "kernel": np.zeros((1, 1, 8, 9), np.float32),
            "bias": np.zeros(9, np.float32)}},
        "fcn_head": {"score": {
            "kernel": np.zeros((1, 1, 16, 19), np.float32),
            "bias": np.zeros(19, np.float32)}},
    }
    out = remap_coco_params_to_cityscapes(coco, city)
    # backbone copied wholesale
    np.testing.assert_array_equal(out["backbone_net"]["conv1"]["kernel"],
                                  coco["backbone_net"]["conv1"]["kernel"])
    # car: city label 3 <- coco label 3
    np.testing.assert_array_equal(
        out["box_head"]["cls_score"]["kernel"][:, 3],
        coco["box_head"]["cls_score"]["kernel"][:, 3])
    # rider: city label 2 <- coco person (label 1)
    np.testing.assert_array_equal(
        out["box_head"]["cls_score"]["kernel"][:, 2],
        coco["box_head"]["cls_score"]["kernel"][:, 1])
    # bbox blocks of 4: truck city 4 <- coco 8
    np.testing.assert_array_equal(
        out["box_head"]["bbox_pred"]["bias"][16:20],
        coco["box_head"]["bbox_pred"]["bias"][32:36])
    # semantic: city train id 11 (person) <- coco 53
    np.testing.assert_array_equal(
        out["fcn_head"]["score"]["kernel"][..., 11],
        coco["fcn_head"]["score"]["kernel"][..., 53])
    # background row copied
    np.testing.assert_array_equal(
        out["mask_head"]["mask_score"]["bias"][0],
        coco["mask_head"]["mask_score"]["bias"][0])


def test_load_pretrained_any_orbax_dispatch(tmp_path):
    """network.pretrained pointing at an orbax snapshot ('.../latest'
    pointer included) loads directly on a tree match and routes through
    the COCO->Cityscapes head remap on a class-count mismatch
    (SURVEY.md §5.4 fine-tune path)."""
    import logging

    from upsnet_tpu.train.checkpoints import save_checkpoint
    from upsnet_tpu.train.trainer import load_pretrained_any

    logger = logging.getLogger("test")
    rng = np.random.RandomState(0)
    coco = {
        "backbone_net": {"conv1": {
            "kernel": rng.randn(7, 7, 3, 8).astype(np.float32)}},
        "box_head": {
            "cls_score": {
                "kernel": rng.randn(16, 81).astype(np.float32),
                "bias": rng.randn(81).astype(np.float32)},
            "bbox_pred": {
                "kernel": rng.randn(16, 324).astype(np.float32),
                "bias": rng.randn(324).astype(np.float32)},
        },
    }
    ckpt_dir = str(tmp_path / "checkpoints")
    save_checkpoint(ckpt_dir, 120, coco, {"momentum": np.zeros(3, np.float32)})
    latest_ptr = os.path.join(ckpt_dir, "latest")

    # exact tree match -> loaded verbatim via the 'latest' pointer
    same_tpl = jax.tree.map(np.zeros_like, coco)
    out = load_pretrained_any(latest_ptr, same_tpl, logger)
    np.testing.assert_array_equal(
        np.asarray(out["backbone_net"]["conv1"]["kernel"]),
        coco["backbone_net"]["conv1"]["kernel"])

    # cityscapes-shaped target -> remap: backbone copied, car col mapped
    city_tpl = {
        "backbone_net": {"conv1": {
            "kernel": np.zeros((7, 7, 3, 8), np.float32)}},
        "box_head": {
            "cls_score": {
                "kernel": np.zeros((16, 9), np.float32),
                "bias": np.zeros(9, np.float32)},
            "bbox_pred": {
                "kernel": np.zeros((16, 36), np.float32),
                "bias": np.zeros(36, np.float32)},
        },
    }
    out = load_pretrained_any(latest_ptr, city_tpl, logger)
    np.testing.assert_array_equal(
        np.asarray(out["backbone_net"]["conv1"]["kernel"]),
        coco["backbone_net"]["conv1"]["kernel"])
    np.testing.assert_array_equal(
        np.asarray(out["box_head"]["cls_score"]["kernel"])[:, 3],
        coco["box_head"]["cls_score"]["kernel"][:, 3])

    # missing snapshots fail loudly
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        load_pretrained_any(str(tmp_path / "empty" / "latest"),
                            same_tpl, logger)
