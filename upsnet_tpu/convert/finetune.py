"""COCO -> Cityscapes fine-tuning weight surgery.

Reference behavior (SURVEY.md §5.4): the Cityscapes-w-COCO configs load a
COCO-trained UPSNet checkpoint and remap the class-dependent final layers
(box cls/reg, mask output, semantic score, and the panoptic-facing channel
counts change implicitly via num_stuff). Layers whose shape depends on the
class count are re-initialized — except rows/channels of COCO classes that
have a Cityscapes counterpart, which are copied (the 8 Cityscapes things
all exist in COCO).

Label tables:
  * COCO detection labels (1..80, sorted-category order) for the 8
    Cityscapes things: person=1, rider->person, car=3, truck=8, bus=6,
    train=7, motorcycle=4, bicycle=2 (rider has no COCO class; person is
    the closest init).
"""

from __future__ import annotations

import numpy as np

# cityscapes det label (1..8) -> coco det label (1..80)
CITYSCAPES_TO_COCO_LABEL = {
    1: 1,  # person
    2: 1,  # rider  <- person (no COCO rider)
    3: 3,  # car
    4: 8,  # truck
    5: 6,  # bus
    6: 7,  # train
    7: 4,  # motorcycle
    8: 2,  # bicycle
}


def _remap_rows(src: np.ndarray, dst: np.ndarray, mapping: dict,
                block: int = 1) -> np.ndarray:
    """Copy class blocks of the trailing axis: dst[..., d*block:(d+1)*block]
    = src[..., s*block:(s+1)*block]; row 0 (background) always copied."""
    out = np.array(dst)
    out[..., 0:block] = src[..., 0:block]
    for d, s in mapping.items():
        out[..., d * block : (d + 1) * block] = src[
            ..., s * block : (s + 1) * block
        ]
    return out


def remap_coco_params_to_cityscapes(coco_params: dict, city_params: dict,
                                    label_map: dict | None = None) -> dict:
    """Merge a COCO-trained param tree into a Cityscapes-initialized one.

    Shape-compatible leaves are copied wholesale; the class-dependent heads
    (box_head.cls_score / bbox_pred, mask_head.mask_score, fcn_head.score)
    are remapped per the label table. Returns a new tree with city shapes.
    """
    import jax

    label_map = label_map or CITYSCAPES_TO_COCO_LABEL
    out = jax.tree.map(lambda x: np.asarray(x), city_params)

    def copy_matching(src_tree, dst_tree):
        for k, v in src_tree.items():
            if k not in dst_tree:
                continue
            if isinstance(v, dict):
                copy_matching(v, dst_tree[k])
            elif np.shape(v) == np.shape(dst_tree[k]):
                dst_tree[k] = np.asarray(v)

    copy_matching(coco_params, out)

    bh_src = coco_params.get("box_head", {})
    bh_dst = out.get("box_head", {})
    if "cls_score" in bh_src and "cls_score" in bh_dst:
        bh_dst["cls_score"]["kernel"] = _remap_rows(
            np.asarray(bh_src["cls_score"]["kernel"]),
            bh_dst["cls_score"]["kernel"], label_map, 1)
        bh_dst["cls_score"]["bias"] = _remap_rows(
            np.asarray(bh_src["cls_score"]["bias"]),
            bh_dst["cls_score"]["bias"], label_map, 1)
        bh_dst["bbox_pred"]["kernel"] = _remap_rows(
            np.asarray(bh_src["bbox_pred"]["kernel"]),
            bh_dst["bbox_pred"]["kernel"], label_map, 4)
        bh_dst["bbox_pred"]["bias"] = _remap_rows(
            np.asarray(bh_src["bbox_pred"]["bias"]),
            bh_dst["bbox_pred"]["bias"], label_map, 4)
    mh_src = coco_params.get("mask_head", {})
    mh_dst = out.get("mask_head", {})
    if "mask_score" in mh_src and "mask_score" in mh_dst:
        mh_dst["mask_score"]["kernel"] = _remap_rows(
            np.asarray(mh_src["mask_score"]["kernel"]),
            mh_dst["mask_score"]["kernel"], label_map, 1)
        mh_dst["mask_score"]["bias"] = _remap_rows(
            np.asarray(mh_src["mask_score"]["bias"]),
            mh_dst["mask_score"]["bias"], label_map, 1)
    # semantic head final score: class spaces differ structurally
    # (COCO 53 stuff + 80 things vs cityscapes 11 + 8); keep the cityscapes
    # initialization except things that map: city train id = 11 + label - 1,
    # coco train id = 53 + coco_label - 1.
    fs = coco_params.get("fcn_head", {}).get("score")
    fd = out.get("fcn_head", {}).get("score")
    if fs is not None and fd is not None:
        seg_map = {11 + d - 1: 53 + s - 1 for d, s in label_map.items()}
        k_src = np.asarray(fs["kernel"])
        k_dst = np.array(fd["kernel"])
        b_src = np.asarray(fs["bias"])
        b_dst = np.array(fd["bias"])
        for d, s in seg_map.items():
            if s < k_src.shape[-1] and d < k_dst.shape[-1]:
                k_dst[..., d] = k_src[..., s]
                b_dst[d] = b_src[s]
        fd["kernel"] = k_dst
        fd["bias"] = b_dst
    return out
