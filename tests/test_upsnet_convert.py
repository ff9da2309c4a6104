"""Full UPSNet .pth -> JAX conversion tests (VERDICT round-1 item #1).

Covers:
  * numeric equivalence of every layout transform against real torch
    modules (conv SAME padding, fc-on-flattened-RoI, 2x deconv);
  * a synthetic state_dict in UPSNet naming (hand-written keys mirroring
    ``upsnet/models/resnet_upsnet.py`` module names, shapes from SURVEY.md
    §2.3) converting with 100% two-way coverage;
  * loud failure on missing / leftover / shape-mismatched keys;
  * goldens round-trip: two independent param inits fed the same .pth
    produce bit-identical forward dumps — proof no leaf silently stays at
    its random init.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from upsnet_tpu.config import default_config
from upsnet_tpu.convert.torch_converter import load_pretrained
from upsnet_tpu.convert.upsnet_names import (
    ConversionError,
    build_specs,
    convert_upsnet_state,
    looks_like_upsnet,
)

torch = pytest.importorskip("torch")


# ---------------------------------------------------------------------------
# numeric transform equivalence vs torch
# ---------------------------------------------------------------------------


def test_conv_same_padding_matches_torch(rng):
    from upsnet_tpu.convert.torch_converter import conv_w
    from upsnet_tpu.models.layers import conv

    x = rng.randn(1, 4, 9, 11).astype(np.float32)  # NCHW
    m = torch.nn.Conv2d(4, 6, 3, padding=1, bias=True)
    with torch.no_grad():
        ref = m(torch.tensor(x)).numpy()
    params = {
        "kernel": conv_w(m.weight.detach().numpy()),
        "bias": m.bias.detach().numpy(),
    }
    mod = conv(6, 3, use_bias=True)
    got = mod.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), ref, rtol=1e-5, atol=1e-5
    )


def test_fc_on_flattened_roi_matches_torch(rng):
    """torch flattens pooled features as (C, P, P); we flatten (P, P, C)."""
    c, p, out = 8, 7, 16
    x = rng.randn(3, c, p, p).astype(np.float32)
    m = torch.nn.Linear(c * p * p, out)
    with torch.no_grad():
        ref = m(torch.tensor(x).reshape(3, -1)).numpy()
    w = m.weight.detach().numpy()  # (out, C*P*P)
    kernel = np.transpose(w.reshape(out, c, p, p), (2, 3, 1, 0)).reshape(
        p * p * c, out
    )
    got = x.transpose(0, 2, 3, 1).reshape(3, -1) @ kernel + m.bias.detach().numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_deconv_matches_torch(rng):
    from flax import linen as nn

    from upsnet_tpu.convert.torch_converter import deconv_w

    x = rng.randn(2, 5, 6, 6).astype(np.float32)
    m = torch.nn.ConvTranspose2d(5, 7, 2, stride=2)
    with torch.no_grad():
        ref = m(torch.tensor(x)).numpy()
    params = {
        "kernel": deconv_w(m.weight.detach().numpy()),
        "bias": m.bias.detach().numpy(),
    }
    mod = nn.ConvTranspose(7, (2, 2), strides=(2, 2))
    got = mod.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), ref, rtol=1e-5, atol=1e-5
    )


# ---------------------------------------------------------------------------
# synthetic full UPSNet state_dict
# ---------------------------------------------------------------------------


def _micro_cfg(with_dcn=True):
    cfg = default_config()
    return cfg.replace(
        dataset=dataclasses.replace(
            cfg.dataset, num_classes=5, num_seg_classes=7, num_stuff=3
        ),
        network=dataclasses.replace(
            cfg.network,
            backbone="resnet_test",
            backbone_with_dcn=with_dcn,
            dcn_stages=(3, 4, 5),
            dcn_impl="gather",
            norm="frozen_bn",
            fpn_feature_dim=32,
            rcnn_fc_dim=64,
            fcn_head_dim=16,
            compute_dtype="float32",
        ),
    )


def _init_params(cfg, seed=0):
    from upsnet_tpu.models.upsnet import build_model

    model = build_model(cfg)
    params = model.init(
        jax.random.PRNGKey(seed), jnp.zeros((1, 64, 64, 3))
    )["params"]
    return model, params


def _inv_conv(k):  # HWIO -> OIHW
    return np.transpose(np.asarray(k, np.float32), (3, 2, 0, 1))


def _inv_dense(k):  # (in, out) -> (out, in)
    return np.transpose(np.asarray(k, np.float32))


def _inv_deconv(k):  # (kh, kw, in, out) -> (in, out, kh, kw)
    return np.transpose(np.asarray(k, np.float32), (2, 3, 0, 1))


def _inv_deform(k):  # (K, in, out) -> (out, in, kh, kw)
    kk, cin, cout = k.shape
    s = int(np.sqrt(kk))
    return np.transpose(np.asarray(k, np.float32), (2, 1, 0)).reshape(
        cout, cin, s, s
    )


def _synthetic_upsnet_state(params, rng, pooled_box=7):
    """Hand-written UPSNet key names filled with random tensors whose
    shapes invert the converter transforms (backbone/fpn/rpn/rcnn/
    mask_branch/fcn_head naming, SURVEY.md §2.3)."""
    st = {}

    def bn(prefix, c):
        st[f"{prefix}.weight"] = rng.rand(c).astype(np.float32) + 0.5
        st[f"{prefix}.bias"] = rng.randn(c).astype(np.float32)
        st[f"{prefix}.running_mean"] = rng.randn(c).astype(np.float32)
        st[f"{prefix}.running_var"] = rng.rand(c).astype(np.float32) + 0.5
        st[f"{prefix}.num_batches_tracked"] = np.asarray(1000)

    def conv_like(prefix, tgt, bias=True):
        st[f"{prefix}.weight"] = _inv_conv(tgt["kernel"]) * 0 + rng.randn(
            *_inv_conv(tgt["kernel"]).shape
        ).astype(np.float32)
        if bias:
            st[f"{prefix}.bias"] = rng.randn(
                tgt["kernel"].shape[-1]
            ).astype(np.float32)

    bb = params["backbone_net"]
    conv_like("resnet_backbone.conv1.conv1", bb["conv1"], bias=False)
    bn("resnet_backbone.conv1.bn1", 64)
    for name, blk in bb.items():
        if not name.startswith("res"):
            continue
        s, b = name[3:].split("_")
        p = f"resnet_backbone.res{s}.{b}"
        for ci in (1, 2, 3):
            blkc = blk[f"conv{ci}"]
            if ci == 2 and "offset_conv" in blkc:
                st[f"{p}.conv2.weight"] = rng.randn(
                    *_inv_deform(np.asarray(blkc["kernel"])).shape
                ).astype(np.float32)
                conv_like(f"{p}.conv2_offset", blkc["offset_conv"])
            else:
                conv_like(f"{p}.conv{ci}", blkc, bias=False)
            bn(f"{p}.bn{ci}", np.asarray(blk[f"bn{ci}"]["scale"]).shape[0])
        if "shortcut_conv" in blk:
            conv_like(f"{p}.downsample.0", blk["shortcut_conv"], bias=False)
            bn(f"{p}.downsample.1",
               np.asarray(blk["shortcut_bn"]["scale"]).shape[0])

    for i in range(2, 6):
        conv_like(f"fpn.fpn_p{i}_1x1", params["fpn"][f"lateral{i}"])
        conv_like(f"fpn.fpn_p{i}", params["fpn"][f"output{i}"])

    conv_like("rpn.conv_proposal.0", params["rpn"]["conv"])
    conv_like("rpn.cls_score", params["rpn"]["cls_score"])
    conv_like("rpn.bbox_pred", params["rpn"]["bbox_pred"])

    def dense_like(prefix, tgt):
        st[f"{prefix}.weight"] = rng.randn(
            *_inv_dense(tgt["kernel"]).shape
        ).astype(np.float32)
        st[f"{prefix}.bias"] = rng.randn(
            tgt["kernel"].shape[-1]
        ).astype(np.float32)

    fc1 = np.asarray(params["box_head"]["fc1"]["kernel"])
    c = fc1.shape[0] // (pooled_box * pooled_box)
    st["rcnn.fc6.weight"] = rng.randn(fc1.shape[1], c * pooled_box**2).astype(
        np.float32
    )
    st["rcnn.fc6.bias"] = rng.randn(fc1.shape[1]).astype(np.float32)
    dense_like("rcnn.fc7", params["box_head"]["fc2"])
    dense_like("rcnn.cls_score", params["box_head"]["cls_score"])
    dense_like("rcnn.bbox_pred", params["box_head"]["bbox_pred"])

    for i in range(1, 5):
        conv_like(f"mask_branch.mask_conv{i}", params["mask_head"][f"conv{i}"])
    dk = _inv_deconv(np.asarray(params["mask_head"]["deconv"]["kernel"]))
    st["mask_branch.mask_deconv.weight"] = rng.randn(*dk.shape).astype(np.float32)
    st["mask_branch.mask_deconv.bias"] = rng.randn(dk.shape[1]).astype(np.float32)
    conv_like("mask_branch.mask_score", params["mask_head"]["mask_score"])

    sub = params["fcn_head"]["subnet"]
    for name in sub:
        i = int(name[3:]) - 1
        st[f"fcn_head.fcn_subnet.conv.{i}.weight"] = rng.randn(
            *_inv_deform(np.asarray(sub[name]["kernel"])).shape
        ).astype(np.float32)
        # no bias on the deform conv itself (torch DCN convention);
        # converter must default it to zeros
        conv_like(f"fcn_head.fcn_subnet.conv_offset.{i}", sub[name]["offset_conv"])
    conv_like("fcn_head.score", params["fcn_head"]["score"])
    return st


def test_full_upsnet_state_converts_100pct(rng):
    cfg = _micro_cfg(with_dcn=True)
    _, params = _init_params(cfg)
    state = _synthetic_upsnet_state(params, rng)
    assert looks_like_upsnet(state)
    merged, report = convert_upsnet_state(state, params, strict=True)
    assert report["missing"] == []
    assert report["leftover"] == []
    assert report["shape_errors"] == []
    assert len(report["loaded"]) == len(build_specs(params))
    # deform bias defaulted to zeros (absent in source, present in target)
    assert any(d.startswith("fcn_head.subnet.dcn") for d in report["defaulted"])

    # spot values survive the transposes
    np.testing.assert_allclose(
        np.asarray(merged["backbone_net"]["conv1"]["kernel"]),
        np.transpose(state["resnet_backbone.conv1.conv1.weight"], (2, 3, 1, 0)),
    )
    np.testing.assert_allclose(
        np.asarray(merged["box_head"]["fc2"]["kernel"]),
        state["rcnn.fc7.weight"].T,
    )
    # BN folded, not copied
    g = state["resnet_backbone.res3.0.bn2.weight"]
    v = state["resnet_backbone.res3.0.bn2.running_var"]
    np.testing.assert_allclose(
        np.asarray(merged["backbone_net"]["res3_0"]["bn2"]["scale"]),
        g / np.sqrt(v + 1e-5), rtol=1e-6,
    )
    # backbone DCN offset conv mapped
    assert np.asarray(
        merged["backbone_net"]["res4_0"]["conv2"]["offset_conv"]["kernel"]
    ).shape[-1] == 18
    # every leaf differs from init (nothing silently kept)
    flat_init = jax.tree.leaves_with_path(params)
    flat_new = dict(
        (jax.tree_util.keystr(p), a) for p, a in jax.tree.leaves_with_path(merged)
    )
    changed = sum(
        not np.allclose(np.asarray(a), np.asarray(flat_new[jax.tree_util.keystr(p)]))
        for p, a in flat_init
    )
    # all but the zero-default biases (they were zeros at init too)
    assert changed >= len(flat_init) - len(report["defaulted"]) - 2


def test_missing_key_fails_loudly(rng):
    cfg = _micro_cfg()
    _, params = _init_params(cfg)
    state = _synthetic_upsnet_state(params, rng)
    del state["rcnn.fc7.weight"], state["rcnn.fc7.bias"]
    with pytest.raises(ConversionError, match="box_head.fc2"):
        convert_upsnet_state(state, params, strict=True)


def test_leftover_key_fails_loudly(rng):
    cfg = _micro_cfg()
    _, params = _init_params(cfg)
    state = _synthetic_upsnet_state(params, rng)
    state["panoptic_extra.mystery.weight"] = np.zeros((3, 3), np.float32)
    with pytest.raises(ConversionError, match="mystery"):
        convert_upsnet_state(state, params, strict=True)
    # non-strict: reported, not raised
    _, report = convert_upsnet_state(state, params, strict=False)
    assert report["leftover"] == ["panoptic_extra.mystery.weight"]


def test_shape_mismatch_fails_loudly(rng):
    cfg = _micro_cfg()
    _, params = _init_params(cfg)
    state = _synthetic_upsnet_state(params, rng)
    state["rpn.cls_score.weight"] = rng.randn(12, 32, 1, 1).astype(np.float32)
    with pytest.raises(ConversionError, match="rpn.cls_score"):
        convert_upsnet_state(state, params, strict=True)


def test_goldens_roundtrip_two_inits_identical(rng, tmp_path):
    """Two different random inits + the same .pth => bit-identical
    forward outputs. Any silently-skipped leaf would break this."""
    cfg = _micro_cfg(with_dcn=False)
    model, params_a = _init_params(cfg, seed=0)
    _, params_b = _init_params(cfg, seed=1)
    state = _synthetic_upsnet_state(params_a, rng)
    torch.save({"state_dict": {k: torch.tensor(v) for k, v in state.items()
                               if not np.isscalar(v)}},
               tmp_path / "upsnet_micro.pth")

    a = load_pretrained(str(tmp_path / "upsnet_micro.pth"), params_a)
    b = load_pretrained(str(tmp_path / "upsnet_micro.pth"), params_b)

    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    out_a = model.apply({"params": a}, x, method="extract")
    out_b = model.apply({"params": b}, x, method="extract")
    for ta, tb in zip(jax.tree.leaves(out_a), jax.tree.leaves(out_b)):
        np.testing.assert_array_equal(np.asarray(ta), np.asarray(tb))
