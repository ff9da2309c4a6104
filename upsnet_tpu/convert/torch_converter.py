"""PyTorch -> JAX weight converter.

Converts released UPSNet ``.pth`` checkpoints (and torchvision-style
caffe-ResNet ImageNet weights used for init, SURVEY.md §5.4) into this
framework's parameter pytree. Required early because every parity test
gates on it (SURVEY.md §7.2 M0).

Layout conversions:
  * conv weight: torch OIHW -> flax HWIO transpose;
  * dense: torch (out, in) -> flax (in, out);
  * deconv (ConvTranspose): torch (in, out, kh, kw) -> flax HWIO;
  * BatchNorm: folded to FrozenBatchNorm affines
      scale = gamma / sqrt(running_var + eps), bias = beta - mean * scale;
  * deformable conv kernel: OIHW (out, in, 3, 3) -> (K=9, in, out) tap-major.

Name mapping covers two source schemes:
  * torchvision ResNet ("conv1.weight", "layer1.0.conv1.weight", ...)
    for ImageNet backbone init (backbone subtree only, by design);
  * full UPSNet naming ("resnet_backbone.res2.0...", "fpn.fpn_p2_1x1",
    "rcnn.fc6", "mask_branch.*", "fcn_head.*") via the declarative spec
    table in convert/upsnet_names.py — strict both ways (every target
    leaf fed, every source key consumed, else ConversionError).
"""

from __future__ import annotations

import re

import numpy as np

BN_EPS = 1e-5


def _fold_bn(gamma, beta, mean, var, eps=BN_EPS):
    scale = gamma / np.sqrt(var + eps)
    bias = beta - mean * scale
    return scale.astype(np.float32), bias.astype(np.float32)


def conv_w(t):  # OIHW -> HWIO
    return np.transpose(np.asarray(t, np.float32), (2, 3, 1, 0))


def deconv_w(t):  # torch ConvTranspose2d (in, out, kh, kw) -> HWIO (flax)
    # torch scatters out[s*i+di] += in[i] * w[..., di]; flax ConvTranspose
    # is an lhs-dilated conv with no kernel flip, so the taps must be
    # spatially reversed (verified vs torch in tests/test_upsnet_convert.py)
    return np.transpose(np.asarray(t, np.float32), (2, 3, 0, 1))[::-1, ::-1]


def dense_w(t):  # (out, in) -> (in, out)
    return np.transpose(np.asarray(t, np.float32), (1, 0))


def deform_w(t):  # (out, in, kh, kw) -> (kh*kw, in, out)
    t = np.asarray(t, np.float32)
    o, i, kh, kw = t.shape
    return np.transpose(t.reshape(o, i, kh * kw), (2, 1, 0))


def torchvision_resnet_to_backbone(state: dict, depth: str = "resnet50") -> dict:
    """torchvision ResNet state_dict -> 'backbone_net' param subtree.

    NOTE: torchvision ResNet puts the downsampling stride on the 3x3 conv
    (v1.5); caffe-style UPSNet weights put it on the first 1x1, which is
    what this model implements. torchvision weights still load (shapes
    match) but are v1.5-trained; converted caffe weights are preferred for
    parity runs.
    """
    blocks = {"resnet50": (3, 4, 6, 3), "resnet101": (3, 4, 23, 3)}[depth]
    out: dict = {}

    def bn(prefix):
        return _fold_bn(
            np.asarray(state[f"{prefix}.weight"], np.float32),
            np.asarray(state[f"{prefix}.bias"], np.float32),
            np.asarray(state[f"{prefix}.running_mean"], np.float32),
            np.asarray(state[f"{prefix}.running_var"], np.float32),
        )

    out["conv1"] = {"kernel": conv_w(state["conv1.weight"])}
    s, b = bn("bn1")
    out["bn1"] = {"scale": s, "bias": b}
    for stage_i, n in enumerate(blocks, start=2):
        layer = f"layer{stage_i - 1}"
        for bi in range(n):
            blk: dict = {}
            for ci in (1, 2, 3):
                blk[f"conv{ci}"] = {
                    "kernel": conv_w(state[f"{layer}.{bi}.conv{ci}.weight"])
                }
                s, b = bn(f"{layer}.{bi}.bn{ci}")
                blk[f"bn{ci}"] = {"scale": s, "bias": b}
            if f"{layer}.{bi}.downsample.0.weight" in state:
                blk["shortcut_conv"] = {
                    "kernel": conv_w(state[f"{layer}.{bi}.downsample.0.weight"])
                }
                s, b = bn(f"{layer}.{bi}.downsample.1")
                blk["shortcut_bn"] = {"scale": s, "bias": b}
            out[f"res{stage_i}_{bi}"] = blk
    return out


def load_torch_state(path: str) -> dict:
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return {
        re.sub(r"^module\.", "", k): v.numpy() if hasattr(v, "numpy") else v
        for k, v in obj.items()
    }


def load_pretrained(path: str, params: dict, logger=None, *,
                    strict: bool = True) -> dict:
    """Merge a torch checkpoint into an initialized param tree.

    Dispatch on the source naming scheme:
      * full UPSNet state_dict -> convert/upsnet_names.py strict converter
        (every target param fed, every source key consumed, or raise);
      * torchvision ResNet -> backbone subtree only (ImageNet init; heads
        stay at their random init — that is the point of ImageNet init).

    ``strict=False`` downgrades conversion errors to a logged report (for
    exploratory loading only; parity runs must stay strict).
    """
    state = load_torch_state(path)
    from upsnet_tpu.convert.upsnet_names import (
        convert_upsnet_state,
        looks_like_upsnet,
    )

    if looks_like_upsnet(state):
        merged, report = convert_upsnet_state(state, params, strict=strict)
        if logger:
            logger.info(
                "UPSNet checkpoint %s: loaded %d units, %d missing, "
                "%d leftover, defaulted %s",
                path, len(report["loaded"]), len(report["missing"]),
                len(report["leftover"]), report["defaulted"] or "none",
            )
        return merged

    depth = "resnet101" if any(k.startswith("layer3.22") for k in state) else "resnet50"
    backbone = torchvision_resnet_to_backbone(state, depth)
    import jax

    params = dict(params)
    merged = {**params["backbone_net"]}
    problems = []
    for k, v in backbone.items():
        if k not in merged:
            problems.append(f"converted block {k} absent from target tree")
            continue
        src_leaves = jax.tree.leaves(v)
        tgt_leaves = jax.tree.leaves(merged[k])
        if all(a.shape == np.asarray(b).shape
               for a, b in zip(src_leaves, tgt_leaves)):
            merged[k] = jax.tree.map(lambda x: np.asarray(x), v)
        else:
            problems.append(f"shape mismatch in backbone block {k}")
    if problems and strict:
        raise RuntimeError(
            f"torchvision backbone load from {path} incomplete:\n  "
            + "\n  ".join(problems)
        )
    params["backbone_net"] = merged
    if logger:
        logger.info(
            "loaded %d backbone blocks from %s (heads keep their init)%s",
            len(backbone) - len(problems), path,
            f"; problems: {problems}" if problems else "",
        )
    return params
