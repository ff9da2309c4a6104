"""UPSNet: unified panoptic segmentation network — full assembly.

Reference: uber-research/UPSNet ``upsnet/models/resnet_upsnet.py``
(SURVEY.md §2.3, §3.3, §3.4). ``forward()`` there branches on
``self.training``; here the two branches are two pure functions over one
parameter pytree:

  * ``forward_train``  — returns the 7-term loss dict (SURVEY.md §3.3),
    with proposal generation, RoI/RPN target assignment, and the panoptic
    teacher-forced fusion ALL on device in one XLA program.
  * ``forward_predict`` — returns padded detections, mask logits, semantic
    logits and the fused panoptic map (SURVEY.md §3.2 + §3.4); only PNG/RLE
    encoding remains for the host.

Static shapes throughout: proposals padded to post_nms_top_n, sampled RoIs
to batch_rois, detections to max_det, GT to max_gt_instances.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from upsnet_tpu.config.defaults import Config
from upsnet_tpu.models.fcn import FCNHead
from upsnet_tpu.models.fpn import FPN
from upsnet_tpu.models.heads import BoxHead, MaskHead
from upsnet_tpu.models.registry import register_model
from upsnet_tpu.models.resnet import ResNetBackbone
from upsnet_tpu.models.rpn import RPNHead
from upsnet_tpu.ops import panoptic as pan_ops
from upsnet_tpu.ops.boxes import clip_boxes, decode_boxes, fpn_level_assignment
from upsnet_tpu.ops.nms import batched_class_nms
from upsnet_tpu.ops.proposals import pyramid_proposals
from upsnet_tpu.ops.roi_align import fpn_roi_align_batched
from upsnet_tpu.ops.targets import proposal_mask_targets, rpn_targets
from upsnet_tpu.train import losses as L


class UPSNetModule(nn.Module):
    """Parametered sub-networks; parameter-free ops live in ops/."""

    num_classes: int = 81
    num_seg_classes: int = 133
    backbone: str = "resnet50"
    dcn_stages: tuple = ()
    fpn_dim: int = 256
    num_anchors: int = 3
    rcnn_fc_dim: int = 1024
    fcn_dim: int = 128
    fcn_num_layers: int = 2
    fcn_with_dcn: bool = True
    fcn_shared_subnet: bool = True
    dcn_impl: str = "pallas"
    dcn_max_dy: int = 6
    dcn_boundary_grad: str = "clip"
    norm: str = "frozen_bn"
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone_net = ResNetBackbone(
            depth=self.backbone, dcn_stages=self.dcn_stages,
            dcn_impl=self.dcn_impl, dcn_max_dy=self.dcn_max_dy,
            dcn_boundary_grad=self.dcn_boundary_grad,
            norm=self.norm, dtype=self.dtype,
        )
        self.fpn = FPN(self.fpn_dim, dtype=self.dtype)
        self.rpn = RPNHead(self.num_anchors, self.fpn_dim, dtype=self.dtype)
        self.box_head = BoxHead(self.num_classes, self.rcnn_fc_dim, dtype=self.dtype)
        self.mask_head = MaskHead(self.num_classes, dtype=self.dtype)
        self.fcn_head = FCNHead(
            self.num_seg_classes,
            self.fcn_dim,
            self.fcn_num_layers,
            self.fcn_with_dcn,
            self.fcn_shared_subnet,
            self.dcn_impl,
            self.dcn_max_dy,
            dcn_boundary_grad=self.dcn_boundary_grad,
            dtype=self.dtype,
        )

    def extract(self, images):
        """Backbone + FPN + RPN + semantic head (the dense trunk)."""
        cs = self.backbone_net(images)
        pyramid = self.fpn(cs)  # P2..P6
        rpn_cls, rpn_bbox = self.rpn(pyramid)
        fcn_logits, _ = self.fcn_head(pyramid[:4])
        return pyramid, rpn_cls, rpn_bbox, fcn_logits

    def box_branch(self, pooled):
        return self.box_head(pooled)

    def mask_branch(self, pooled):
        return self.mask_head(pooled)

    def __call__(self, images):
        """Init/compile path touching every parameter."""
        pyramid, rpn_cls, rpn_bbox, fcn_logits = self.extract(images)
        c = pyramid[0].shape[-1]
        box_out = self.box_branch(jnp.zeros((1, 7, 7, c), pyramid[0].dtype))
        mask_out = self.mask_branch(jnp.zeros((1, 14, 14, c), pyramid[0].dtype))
        return pyramid, rpn_cls, rpn_bbox, fcn_logits, box_out, mask_out


def build_model(cfg: Config) -> UPSNetModule:
    net = cfg.network
    return UPSNetModule(
        num_classes=cfg.dataset.num_classes,
        num_seg_classes=cfg.dataset.num_seg_classes,
        backbone=net.backbone,
        dcn_stages=tuple(net.dcn_stages) if net.backbone_with_dcn else (),
        fpn_dim=net.fpn_feature_dim,
        num_anchors=net.num_anchors,
        rcnn_fc_dim=net.rcnn_fc_dim,
        fcn_dim=net.fcn_head_dim,
        fcn_num_layers=net.fcn_num_layers,
        fcn_with_dcn=net.fcn_with_dcn,
        fcn_shared_subnet=net.fcn_shared_subnet,
        dcn_impl=net.dcn_impl,
        dcn_max_dy=net.dcn_max_dy,
        dcn_boundary_grad=net.dcn_boundary_grad,
        norm=net.norm,
        dtype=jnp.dtype(net.compute_dtype),
    )


@register_model("upsnet")
def upsnet_from_config(cfg: Config) -> UPSNetModule:
    """Generic symbol: backbone taken from cfg.network.backbone."""
    return build_model(cfg)


@register_model("resnet_50_upsnet")
def resnet_50_upsnet(cfg: Config) -> UPSNetModule:
    import dataclasses

    return build_model(
        cfg.replace(network=dataclasses.replace(cfg.network, backbone="resnet50"))
    )


@register_model("resnet_101_upsnet")
def resnet_101_upsnet(cfg: Config) -> UPSNetModule:
    import dataclasses

    return build_model(
        cfg.replace(network=dataclasses.replace(cfg.network, backbone="resnet101"))
    )


# ---------------------------------------------------------------------------
# shared plumbing
# ---------------------------------------------------------------------------


def _flatten_rpn(rpn_cls, rpn_bbox):
    """Per-level (B, H, W, A*k) -> (B, sum HWA, k), row-major (y, x, a) to
    match the anchor grid layout."""
    cls_flat, bbox_flat = [], []
    for c, b in zip(rpn_cls, rpn_bbox):
        bsz = c.shape[0]
        cls_flat.append(c.reshape(bsz, -1, 2))
        bbox_flat.append(b.reshape(bsz, -1, 4))
    return jnp.concatenate(cls_flat, 1), jnp.concatenate(bbox_flat, 1)


def _pool_boxes(pyramid, rois, pooled, sampling_ratio=2, impl="gather"):
    """Fused batched ROIAlign over P2..P5 (each (B, H, W, C))."""
    levels = jax.vmap(lambda r: fpn_level_assignment(r) - 2)(rois)
    return fpn_roi_align_batched(
        tuple(pyramid[:4]), rois, levels, pooled=pooled,
        sampling_ratio=sampling_ratio, impl=impl,
    )


class Detections(NamedTuple):
    boxes: jnp.ndarray  # (B, D, 4)
    scores: jnp.ndarray  # (B, D)
    classes: jnp.ndarray  # (B, D) int32, 1..C-1
    valid: jnp.ndarray  # (B, D) bool


# ---------------------------------------------------------------------------
# training forward
# ---------------------------------------------------------------------------


def forward_train(model, params, cfg: Config, anchors, batch, key):
    """One training forward pass. Returns (total_loss, loss_dict).

    batch: images (B,H,W,3), im_hw (B,2), gt_boxes (B,G,4), gt_classes
    (B,G), gt_valid (B,G), gt_masks (B,G,H/4,W/4), seg_gt (B,H/4,W/4);
    optional crowd_boxes (B,Gc,4) + crowd_valid (B,Gc) iscrowd ignore
    regions (excluded from negative pools, Detectron lineage).
    """
    tc, net, ds = cfg.train, cfg.network, cfg.dataset
    images = batch["images"]
    bsz = images.shape[0]
    gc = cfg.train.max_crowd_instances
    crowd_boxes = batch.get(
        "crowd_boxes", jnp.zeros((bsz, gc, 4), jnp.float32)
    )
    crowd_valid = batch.get("crowd_valid", jnp.zeros((bsz, gc), bool))
    extract = lambda p, im: model.apply({"params": p}, im, method="extract")
    if tc.remat:
        policy = None
        if tc.remat_policy == "save_dcn":
            policy = jax.checkpoint_policies.save_only_these_names("dcn_out")
        extract = jax.checkpoint(extract, policy=policy)
    pyramid, rpn_cls, rpn_bbox, fcn_logits = extract(params, images)
    cls_flat, bbox_flat = _flatten_rpn(rpn_cls, rpn_bbox)
    anchors_cat = jnp.concatenate(anchors, axis=0)

    keys = jax.random.split(key, (3, bsz))

    # --- RPN losses -------------------------------------------------------
    rt = jax.vmap(
        lambda k, gb, gv, hw, cb, cv: rpn_targets(
            k, anchors_cat, gb, gv, hw,
            batch_size=tc.rpn_batch_size,
            fg_fraction=tc.rpn_fg_fraction,
            positive_overlap=tc.rpn_positive_overlap,
            negative_overlap=tc.rpn_negative_overlap,
            straddle_thresh=tc.rpn_straddle_thresh,
            crowd_boxes=cb, crowd_valid=cv,
            crowd_thresh=tc.crowd_filter_thresh,
        )
    )(keys[0], batch["gt_boxes"], batch["gt_valid"], batch["im_hw"],
      crowd_boxes, crowd_valid)
    loss_rpn_cls = L.rpn_cls_loss(
        cls_flat.reshape(-1, 2), rt.labels.reshape(-1)
    )
    loss_rpn_bbox = L.rpn_bbox_loss(
        bbox_flat.reshape(-1, 4),
        rt.bbox_targets.reshape(-1, 4),
        rt.bbox_inside.reshape(-1),
        jnp.sum(rt.norm),
    )

    # --- proposals + RoI sampling ----------------------------------------
    prop_fn = lambda cl, bb, hw: pyramid_proposals(
        cl, bb, anchors, hw,
        pre_nms_top_n=tc.rpn_pre_nms_top_n,
        post_nms_top_n=tc.rpn_post_nms_top_n,
        nms_thresh=tc.rpn_nms_thresh,
        min_size=tc.rpn_min_size,
    )
    rois, _, roi_valid = jax.vmap(prop_fn)(
        tuple(rpn_cls), tuple(rpn_bbox), batch["im_hw"]
    )
    rois = jax.lax.stop_gradient(rois)

    tgt = jax.vmap(
        lambda k, r, rv, gb, gc_, gv, gm, cb, cv: proposal_mask_targets(
            k, r, rv, gb, gc_, gv, gm,
            batch_rois=tc.batch_rois,
            fg_fraction=tc.fg_fraction,
            fg_thresh=tc.fg_thresh,
            bg_thresh_hi=tc.bg_thresh_hi,
            bg_thresh_lo=tc.bg_thresh_lo,
            bbox_weights=tuple(net.bbox_reg_weights),
            mask_size=net.mask_size,
            mask_scale=0.25,  # gt_masks live at 1/4 scale
            crowd_boxes=cb, crowd_valid=cv,
            crowd_thresh=tc.crowd_filter_thresh,
        )
    )(
        keys[1], rois, roi_valid,
        batch["gt_boxes"], batch["gt_classes"], batch["gt_valid"],
        batch["gt_masks"], crowd_boxes, crowd_valid,
    )

    # --- box head ---------------------------------------------------------
    pooled_box = _pool_boxes(pyramid, tgt.rois, net.pooled_size_box,
                            impl=net.roi_align_impl)
    r = tc.batch_rois
    cls_score, bbox_pred = model.apply(
        {"params": params},
        pooled_box.reshape(bsz * r, net.pooled_size_box, net.pooled_size_box, -1),
        method="box_branch",
    )
    loss_cls = L.rcnn_cls_loss(
        cls_score, tgt.labels.reshape(-1), tgt.valid.reshape(-1)
    )
    loss_bbox = L.rcnn_bbox_loss(
        bbox_pred,
        tgt.labels.reshape(-1),
        tgt.bbox_targets.reshape(-1, 4),
        tgt.fg.reshape(-1),
        tgt.valid.reshape(-1),
    )

    # --- mask head on fg RoIs (layout: fg occupy the first k_fg slots) ----
    k_fg = int(tc.batch_rois * tc.fg_fraction)
    fg_rois = tgt.rois[:, :k_fg]
    pooled_mask = _pool_boxes(pyramid, fg_rois, net.pooled_size_mask,
                             impl=net.roi_align_impl)
    mask_logits = model.apply(
        {"params": params},
        pooled_mask.reshape(
            bsz * k_fg, net.pooled_size_mask, net.pooled_size_mask, -1
        ),
        method="mask_branch",
    )
    loss_mask = L.mask_loss(
        mask_logits,
        tgt.labels[:, :k_fg].reshape(-1),
        tgt.mask_targets[:, :k_fg].reshape(-1, net.mask_size, net.mask_size),
        tgt.fg[:, :k_fg].reshape(-1),
    )

    # --- semantic head ----------------------------------------------------
    loss_seg = (
        L.seg_loss(fcn_logits, batch["seg_gt"])
        if net.has_fcn_head
        else jnp.asarray(0.0)
    )
    if net.has_fcn_head and tc.fcn_with_roi_loss:
        roi_seg = jax.vmap(
            lambda lg, gt, gb, gv: L.seg_roi_loss(lg, gt, gb * 0.25, gv)
        )(fcn_logits, batch["seg_gt"], batch["gt_boxes"], batch["gt_valid"])
        loss_seg = loss_seg + tc.fcn_roi_loss_weight * jnp.mean(roi_seg)

    # --- panoptic head (teacher-forced: GT boxes/classes + predicted
    # mask logits, SURVEY.md §3.3; requires the semantic head) -------------
    if net.has_panoptic_head and net.has_fcn_head:
        g = batch["gt_boxes"].shape[1]
        pooled_gt = _pool_boxes(pyramid, batch["gt_boxes"], net.pooled_size_mask,
                                impl=net.roi_align_impl)
        gt_mask_logits = model.apply(
            {"params": params},
            pooled_gt.reshape(
                bsz * g, net.pooled_size_mask, net.pooled_size_mask, -1
            ),
            method="mask_branch",
        )
        gt_cls = batch["gt_classes"].reshape(-1)
        gt_chan = jnp.take_along_axis(
            gt_mask_logits.astype(jnp.float32),
            gt_cls[:, None, None, None].astype(jnp.int32),
            axis=-1,
        )[..., 0].reshape(bsz, g, net.mask_size, net.mask_size)

        to_unknown = (
            jax.random.uniform(jax.random.fold_in(key, 7), (bsz, g))
            > tc.panoptic_box_keep_fraction
        )

        def pano_one(seg_lg, gb, gc, gv, unk, gm, seg_gt, mlg):
            inst_valid = gv & ~unk
            _, pan_logits = pan_ops.panoptic_argmax(
                seg_lg.astype(jnp.float32),
                gb * 0.25,
                jnp.maximum(gc - 1, 0),
                mlg,
                inst_valid,
                ds.num_stuff,
            )
            pan_gt = pan_ops.mask_matching(seg_gt, gm, gv, unk, ds.num_stuff)
            return L.panoptic_loss(pan_logits, pan_gt)

        loss_pano = jnp.mean(
            jax.vmap(pano_one)(
                fcn_logits,
                batch["gt_boxes"],
                batch["gt_classes"],
                batch["gt_valid"],
                to_unknown,
                batch["gt_masks"],
                batch["seg_gt"],
                gt_chan,
            )
        )
    else:
        loss_pano = jnp.asarray(0.0)

    losses = {
        "rpn_cls": loss_rpn_cls,
        "rpn_bbox": loss_rpn_bbox,
        "cls": loss_cls,
        "bbox": loss_bbox,
        "mask": loss_mask,
        "seg": loss_seg * tc.fcn_loss_weight,
        "pano": loss_pano * tc.panoptic_loss_weight,
    }
    total = sum(losses.values())
    return total, losses


# ---------------------------------------------------------------------------
# inference forward
# ---------------------------------------------------------------------------


def _detection_nms(boxes_pc, scores_pc, cfg_test, num_classes: int):
    """Joint class-offset NMS + global top-k for one image.

    boxes_pc (R, C, 4) decoded per class; scores_pc (R, C) softmax scores.
    Detectron pipeline semantics (score >= score_thresh, per-class
    NMS(0.5), top max_det overall by score) computed as ONE suppression
    fixpoint: boxes of different classes are shifted so they never
    overlap, making per-class NMS and joint NMS identical, and greedy
    NMS's first max_det keeps in global score order are exactly the
    global top-max_det of the union of per-class survivors (a survivor
    ranked below max_det within its own class is ranked below max_det
    globally too). Replaces the (C-1)-way vmapped per-class fixpoint —
    one argsort + one (pool, pool) IoU matrix instead of 80 — and the
    per-class top-256 cap whose failure mode was crowd scenes; the
    global score-ranked pool (cfg_test.detection_nms_pool) is validated
    in tests/test_caps_adversarial.py.
    """
    rr = boxes_pc.shape[0]
    nc = num_classes - 1  # classes 1..C-1 (skip background)
    boxes_f = boxes_pc[:, 1:].reshape(rr * nc, 4)
    scores_f = scores_pc[:, 1:].reshape(rr * nc)
    classes_f = jnp.broadcast_to(
        jnp.arange(1, num_classes, dtype=jnp.int32)[None, :], (rr, nc)
    ).reshape(-1)
    ok = scores_f >= cfg_test.score_thresh
    sc = jnp.where(ok, scores_f, -jnp.inf)
    pool = getattr(cfg_test, "detection_nms_pool", 2048) or (rr * nc)
    pool = min(pool, rr * nc)
    top_sc, top_i = jax.lax.top_k(sc, pool)
    idx, keep = batched_class_nms(
        boxes_f[top_i], top_sc, classes_f[top_i], cfg_test.nms_thresh,
        cfg_test.max_det, jnp.isfinite(top_sc),
    )
    safe = top_i[jnp.maximum(idx, 0)]
    return (
        boxes_f[safe],
        jnp.where(keep, scores_f[safe], -jnp.inf),
        classes_f[safe],
        keep,
    )


def panoptic_fuse(seg_lg, boxes, classes, ms_logits, scores_i, valid_i,
                  *, score_thresh: float, overlap_thresh: float,
                  num_stuff: int):
    """Single-image panoptic fusion (SURVEY.md §3.4): score filter ->
    MaskRemoval de-overlap -> logit stack argmax. Boxes in image coords
    (seg logits live at 1/4 scale). Also used standalone by multi-scale
    TTA, which fuses averaged semantic logits with merged detections."""
    seg_lg = seg_lg.astype(jnp.float32)
    keep_score = valid_i & (scores_i >= score_thresh)
    seg_hw = (seg_lg.shape[0], seg_lg.shape[1])
    boxes_q = boxes * 0.25
    pasted = pan_ops.mask_term(jax.nn.sigmoid(ms_logits), boxes_q, seg_hw)
    keep = pan_ops.mask_removal(pasted, keep_score, overlap_thresh)
    pan_map = pan_ops.panoptic_argmax_stream(
        seg_lg, boxes_q, jnp.maximum(classes - 1, 0), ms_logits, keep,
        num_stuff,
    )
    return pan_map, keep


def forward_predict(model, params, cfg: Config, anchors, batch):
    """Inference. Returns a dict of padded, device-resident outputs."""
    tc, net, ds = cfg.test, cfg.network, cfg.dataset
    images = batch["images"]
    bsz = images.shape[0]
    pyramid, rpn_cls, rpn_bbox, fcn_logits = model.apply(
        {"params": params}, images, method="extract"
    )

    prop_fn = lambda cl, bb, hw: pyramid_proposals(
        cl, bb, anchors, hw,
        pre_nms_top_n=tc.rpn_pre_nms_top_n,
        post_nms_top_n=tc.rpn_post_nms_top_n,
        nms_thresh=tc.rpn_nms_thresh,
    )
    rois, _, roi_valid = jax.vmap(prop_fn)(
        tuple(rpn_cls), tuple(rpn_bbox), batch["im_hw"]
    )

    pooled_box = _pool_boxes(pyramid, rois, net.pooled_size_box,
                            impl=net.roi_align_impl)
    r = rois.shape[1]
    cls_score, bbox_pred = model.apply(
        {"params": params},
        pooled_box.reshape(bsz * r, net.pooled_size_box, net.pooled_size_box, -1),
        method="box_branch",
    )
    c = cls_score.shape[-1]
    scores = jax.nn.softmax(cls_score.astype(jnp.float32), -1).reshape(bsz, r, c)
    deltas = bbox_pred.astype(jnp.float32).reshape(bsz, r, c, 4)

    def decode_one(rois_i, deltas_i, scores_i, valid_i, hw):
        boxes_pc = decode_boxes(
            rois_i[:, None, :], deltas_i, tuple(net.bbox_reg_weights)
        )
        boxes_pc = clip_boxes(boxes_pc, hw)
        scores_i = jnp.where(valid_i[:, None], scores_i, 0.0)
        return _detection_nms(boxes_pc, scores_i, tc, c)

    det_boxes, det_scores, det_classes, det_valid = jax.vmap(decode_one)(
        rois, deltas, scores, roi_valid, batch["im_hw"]
    )
    dets = Detections(det_boxes, det_scores, det_classes, det_valid)

    # --- mask branch on final detections ----------------------------------
    pooled_mask = _pool_boxes(pyramid, dets.boxes, net.pooled_size_mask,
                             impl=net.roi_align_impl)
    d = dets.boxes.shape[1]
    mask_logits_all = model.apply(
        {"params": params},
        pooled_mask.reshape(bsz * d, net.pooled_size_mask, net.pooled_size_mask, -1),
        method="mask_branch",
    ).astype(jnp.float32)
    mask_logits = jnp.take_along_axis(
        mask_logits_all,
        dets.classes.reshape(-1)[:, None, None, None].astype(jnp.int32),
        axis=-1,
    )[..., 0].reshape(bsz, d, net.mask_size, net.mask_size)

    # --- panoptic fusion at 1/4 scale (SURVEY.md §3.4) ---------------------
    fuse_one = functools.partial(
        panoptic_fuse,
        score_thresh=tc.panoptic_score_thresh,
        overlap_thresh=tc.panoptic_mask_overlap_thresh,
        num_stuff=ds.num_stuff,
    )
    pan_map, pan_keep = jax.vmap(fuse_one)(
        fcn_logits, dets.boxes, dets.classes, mask_logits, dets.scores,
        dets.valid,
    )

    return {
        "boxes": dets.boxes,
        "scores": dets.scores,
        "classes": dets.classes,
        "det_valid": dets.valid,
        "mask_logits": mask_logits,
        "seg_logits": fcn_logits.astype(jnp.float32),
        "pan_map": pan_map,  # (B, H/4, W/4) channel indices
        "pan_keep": pan_keep,  # (B, D) detections present in pan_map
    }
