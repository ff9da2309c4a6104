"""Typed configuration tree.

Mirrors the *semantics* of the reference's global easydict config
(`upsnet/config/config.py` in uber-research/UPSNet) — same hyperparameter
names where sensible so the reference's experiment yamls load directly — but
as typed dataclasses (SURVEY.md §5.6) with a few TPU-specific additions
(static padded sizes, compute dtype, mesh shape).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Tuple


@dataclass
class NetworkConfig:
    # Reference: config.network.* (upsnet/config/config.py).
    backbone: str = "resnet50"  # resnet50 | resnet101
    pretrained: str = ""  # path to converted ImageNet/caffe weights
    fpn_feature_dim: int = 256
    # Deformable conv in backbone stages res3-res5 (the "-DCN" variants).
    backbone_with_dcn: bool = False
    dcn_stages: Tuple[int, ...] = (3, 4, 5)
    # RPN
    num_anchors: int = 3  # aspect ratios (0.5, 1, 2), one scale per level
    anchor_ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    anchor_scale: float = 8.0  # anchor size = 8 * stride per level
    rpn_channels: int = 256
    # RCNN box head
    rcnn_fc_dim: int = 1024
    pooled_size_box: int = 7
    pooled_size_mask: int = 14
    mask_size: int = 28
    roi_sampling_ratio: int = 2
    # Class-specific bbox regression, Detectron weights.
    bbox_reg_weights: Tuple[float, ...] = (10.0, 10.0, 5.0, 5.0)
    # Semantic (FCN) head
    fcn_head_dim: int = 128
    fcn_num_layers: int = 2  # stacked 3x3 deformable convs per level
    fcn_with_dcn: bool = True
    fcn_shared_subnet: bool = True
    # deformable conv implementation: 'auto' (Pallas window kernel with a
    # runtime lax.cond fallback to the exact gather path when any offset
    # leaves the window — DCNv1-exact for arbitrary offsets) | 'pallas' |
    # 'mxu' (both exact for |dy| <= dcn_max_dy, offsets clipped to the
    # window) | 'gather' (unbounded-exact; simplest gradients) | 'shift'
    # (opt-in 9-tap shift-FMA kernel, exact for |dy|,|dx| <= dcn_max_dy;
    # ties 'pallas' at trained offsets, slower on random fields — kept
    # for experimentation, see ops/deform_shift_pallas.py)
    dcn_impl: str = "auto"
    # DCN impl for the TRAIN step only. Default "" = inherit dcn_impl, so
    # an explicit dcn_impl choice is never silently overridden for
    # training. The flagship experiment yamls opt into 'pallas' here:
    # compiling auto's exact-gather branch into the rematted backward
    # costs ~6 GiB HBM + ~29% step time even when never taken (measured
    # b8: grad 1.71s/21.1G auto vs 1.33s/14.9G pallas). The pallas train
    # path clips offsets to the +-dcn_max_dy window (boundary gradient
    # behavior set by dcn_boundary_grad below); offsets learned from
    # zero-init stay well inside at 1/4 scale, and train-time telemetry
    # logs per-layer max |offset| so saturation is visible.
    dcn_impl_train: str = ""
    dcn_max_dy: int = 6
    # Gradient behavior at the +-dcn_max_dy clip boundary of the windowed
    # train impls ('pallas'/'mxu'): 'clip' = true gradient of the clipped
    # forward (zero beyond the window — a saturated offset is stuck);
    # 'damped' = one-sided straight-through, recommended for training:
    # beyond the window the sample-position gradient passes through the
    # clip only when it points back inside, so saturated offsets can
    # retreat but cannot integrate the fabricated outward component
    # (which ran the r3 rehearsal to ~1e5 px — VERDICT r3 Weak #2);
    # 'straight_through' = two-sided pass-through, kept for comparison
    # only (tests/test_dcn_saturation.py).
    dcn_boundary_grad: str = "clip"
    # What the trainer does when probed offsets stay above
    # 0.9 * dcn_max_dy for 3 consecutive display intervals while training
    # on a clipping impl: 'fail' raises; 'warn' logs an error and keeps
    # going. Probes are logged to metrics.jsonl either way.
    dcn_saturation_action: str = "fail"
    # ROIAlign forward: 'window' (Pallas per-RoI window DMA + joint-hat
    # matmul, ops/roi_align_pallas — ~1.7x the gather path at predict
    # sizes; falls back to gather off-TPU), 'gather' (packed-corner XLA
    # gather), or 'dense' (separable-hat MXU matmuls). Identical
    # semantics; backward is always the dense custom VJP.
    roi_align_impl: str = "window"
    # backbone norm: 'frozen_bn' (reference; needs pretrained stats) or
    # 'gn' (GroupNorm; trainable, stable from scratch)
    norm: str = "frozen_bn"
    has_fcn_head: bool = True
    has_rpn: bool = True
    has_rcnn: bool = True
    has_mask_head: bool = True
    has_panoptic_head: bool = True
    # TPU-specific
    compute_dtype: str = "bfloat16"  # dtype for conv/matmul compute
    param_dtype: str = "float32"
    # Backbone stages with frozen params (reference freezes conv1 + res2).
    frozen_stages: Tuple[int, ...] = (1, 2)


@dataclass
class DatasetConfig:
    # Reference: config.dataset.*
    dataset: str = "coco"  # coco | cityscapes
    dataset_path: str = "data/coco"
    image_set: str = "train2017"
    test_image_set: str = "val2017"
    num_classes: int = 81  # things + background (COCO: 80 + 1)
    num_seg_classes: int = 133  # stuff + things (COCO panoptic: 53 + 80)
    num_stuff: int = 53  # leading channels of the semantic logits are stuff


@dataclass
class TrainConfig:
    # Reference: config.train.*
    scales: Tuple[int, ...] = (800,)
    max_size: int = 1333
    flip: bool = True
    batch_size: int = 1  # images per device
    # RPN proposal generation (train)
    rpn_pre_nms_top_n: int = 2000  # per level
    rpn_post_nms_top_n: int = 1000
    rpn_nms_thresh: float = 0.7
    rpn_min_size: float = 0.0
    # RPN target assignment
    rpn_batch_size: int = 256  # anchors sampled per image
    rpn_fg_fraction: float = 0.5
    rpn_positive_overlap: float = 0.7
    rpn_negative_overlap: float = 0.3
    # anchors extending beyond the image border by more than this are
    # excluded from RPN training (Detectron rpn_straddle_thresh; 0 matches
    # the reference). Set very large to supervise ALL anchors — needed for
    # from-scratch training on small images where whole pyramid levels
    # would otherwise stay untrained and flood eval-time proposals.
    rpn_straddle_thresh: float = 0.0
    # RoI sampling (ProposalMaskTarget)
    batch_rois: int = 512
    fg_fraction: float = 0.25
    fg_thresh: float = 0.5
    bg_thresh_hi: float = 0.5
    bg_thresh_lo: float = 0.0
    # COCO iscrowd regions: anchors/proposals with crowd-IoA >= this are
    # excluded from the negative pool (Detectron _filter_crowd_proposals)
    crowd_filter_thresh: float = 0.7
    max_crowd_instances: int = 8  # static pad for per-image crowd boxes
    # Losses
    fcn_loss_weight: float = 0.2
    panoptic_loss_weight: float = 0.1
    fcn_with_roi_loss: bool = True
    fcn_roi_loss_weight: float = 1.0  # multiplier applied inside fcn loss
    panoptic_box_keep_fraction: float = 0.7  # 30% GT -> unknown augmentation
    # Optimizer / schedule
    lr: float = 0.02
    momentum: float = 0.9
    wd: float = 1e-4
    # global-norm gradient clip; 0 disables. The reference trains without
    # clipping but always from pretrained weights; random-init runs (tests,
    # synthetic overfits) diverge without it.
    grad_clip: float = 35.0
    # LR multiplier for DCN offset convs (params under '.../offset_conv').
    # The reference trains offsets at base LR from zero-init on pretrained
    # backbones and they stay O(1 px) (SURVEY.md §2.1); from-scratch runs
    # (random features -> noisy offset gradients) integrate them to tens
    # of px in tens of iters (the r3/r4 rehearsal telemetry), so
    # from-scratch recipes set this < 1. At 1.0 the offset WEIGHTS match
    # the reference LR exactly; the offset BIAS intentionally differs
    # from the Detectron bias rule (damped 1x instead of 2x — 2x on the
    # zero-init bias amplifies the runaway this multiplier exists to
    # damp; it does follow the no-weight-decay bias rule).
    dcn_offset_lr_mult: float = 1.0
    warmup_iteration: int = 500
    warmup_factor: float = 1.0 / 3.0
    max_iteration: int = 90000
    decay_iteration: Tuple[int, ...] = (60000, 80000)
    decay_factor: float = 0.1
    snapshot_step: int = 5000
    display_iter: int = 20
    resume: bool = False
    begin_iteration: int = 0
    # rematerialize the dense trunk in backward (jax.checkpoint): trades
    # ~25% step time for the trunk's activation memory, enabling larger
    # per-chip batches (b8 train OOMs without it on 16G HBM)
    remat: bool = True
    # remat policy: 'save_dcn' keeps the named 'dcn_out' deform-sample
    # outputs across the remat boundary (a few tens of MB at flagship
    # shapes) so the backward's forward-recompute skips the expensive
    # sampling kernels — their VJP rebuilds the per-tap windows from x
    # with one cheap matmul. '' = plain full remat.
    remat_policy: str = "save_dcn"
    # TPU-specific static shapes
    # Images are bucketed/padded to these (H, W) shapes (multiples of 64).
    image_buckets: Tuple[Tuple[int, int], ...] = ((832, 1344), (1344, 832))
    max_gt_instances: int = 100
    # input-pipeline worker processes (reference: DataLoader num_workers,
    # SURVEY.md §3.1). 0 = single prefetch thread; >0 = forked sample
    # builders with shared-memory transport (data/pipeline.ProcessLoader).
    num_workers: int = 4
    # Built-sample cache budget (MB, 0 = off): caches the deterministic
    # (index, scale, flip) -> sample build in RAM. The win is on small
    # datasets looped for many epochs (the rehearsal/overfit configs) on
    # CPU-starved hosts — after the variants are seen once the loader is
    # a dict lookup instead of ~200 ms of decode+rasterize+resize per
    # sample (data/base.py). Useless for single-pass eval or COCO-scale
    # train sets; leave 0 there.
    sample_cache_mb: int = 0
    # host->device image encoding for the trainer loop (data/wire.py):
    # 'bf16' (default) is the bit-exact encoding — numerically identical
    # to the stem's astype(compute_dtype) cast, so the default pipeline
    # deviates from exact-float inputs by nothing (ADVICE r4). 'uint8'
    # ships the resized image as ordinary 8-bit pixels and mean-subtracts
    # on device — halves the dominant wire term on a relay front-end
    # where copies serialize with compute (|err| <= 0.5 of a 0..255 pixel
    # from rounding the bilinear resize); the rehearsal yamls opt in
    # where that copy was the measured bottleneck. The trainer logs the
    # active encoding at start.
    image_wire: str = "bf16"


@dataclass
class TestConfig:
    # Reference: config.test.*
    scales: Tuple[int, ...] = (800,)
    max_size: int = 1333
    batch_size: int = 1
    rpn_pre_nms_top_n: int = 1000  # per level
    rpn_post_nms_top_n: int = 1000
    rpn_nms_thresh: float = 0.7
    nms_thresh: float = 0.5  # per-class detection NMS
    score_thresh: float = 0.05
    max_det: int = 100
    # static global candidate pool entering the joint class-offset
    # detection NMS (0 = all RoIs x classes). Softmax scores cap the
    # number of classes >= score_thresh per RoI at 1/score_thresh = 20,
    # and real images produce ~1-3, so 2048 covers 1000 RoIs with slack;
    # validated adversarially in tests/test_caps_adversarial.py (capped
    # joint == uncapped per-class reference on the final top-max_det).
    detection_nms_pool: int = 2048
    # Panoptic fusion (SURVEY.md §3.4)
    panoptic_score_thresh: float = 0.6
    # MaskRemoval keep fraction: an instance survives fusion if >= this
    # fraction of its mask is unclaimed by higher-scoring instances.
    # SURVEY.md §3.4 remembers the reference's value as ~0.3 at [M]
    # confidence; 0.5 here is our choice, not confirmed parity — on
    # parity day sweep {0.3, 0.5} against the released checkpoint
    # (parity checklist: tools/convert_report.py docstring).
    panoptic_mask_overlap_thresh: float = 0.5
    panoptic_stuff_area_limit: int = 4096
    image_buckets: Tuple[Tuple[int, int], ...] = ((832, 1344), (1344, 832))
    # Multi-scale / flip test-time augmentation
    multi_scale: Tuple[int, ...] = ()
    flip_test: bool = False


@dataclass
class Config:
    symbol: str = "resnet_50_upsnet"  # model registry key
    output_path: str = "output"
    num_devices: int = 0  # 0 = all local devices
    seed: int = 3407
    network: NetworkConfig = field(default_factory=NetworkConfig)
    dataset: DatasetConfig = field(default_factory=DatasetConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    test: TestConfig = field(default_factory=TestConfig)

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)


def default_config() -> Config:
    return Config()


def _coerce(value: Any, target: Any) -> Any:
    """Coerce a yaml value to the type of the dataclass default."""
    if isinstance(target, bool):
        return bool(value)
    if isinstance(target, int) and not isinstance(value, bool):
        return int(value)
    if isinstance(target, float):
        return float(value)
    if isinstance(target, tuple):
        if isinstance(value, (list, tuple)):
            return tuple(
                tuple(v) if isinstance(v, (list, tuple)) else v for v in value
            )
        return (value,)
    return value


def merge_into_dataclass(dc: Any, overrides: dict) -> Any:
    """Deep-merge a plain dict of overrides into a dataclass tree."""
    updates = {}
    names = {f.name: f for f in dataclasses.fields(dc)}
    for key, value in overrides.items():
        if key not in names:
            continue  # ignore unknown keys (reference yamls carry extras)
        cur = getattr(dc, key)
        if dataclasses.is_dataclass(cur) and isinstance(value, dict):
            updates[key] = merge_into_dataclass(cur, value)
        else:
            updates[key] = _coerce(value, cur)
    return dataclasses.replace(dc, **updates)
