"""cityscapesScripts instance-AP protocol (VERDICT r1 item #7) with
hand-computed expected values, plus the protocol running end-to-end on the
miniature on-disk gtFine fixture."""

import numpy as np

from tests.test_cityscapes import city_cfg, make_fake_cityscapes
from upsnet_tpu.evaluation.cityscapes_eval import (
    CityscapesInstanceEvaluator,
    _ap_from_points,
)
from upsnet_tpu.evaluation import rle as rle_mod


def _sq(h, w, y, x, s):
    m = np.zeros((h, w), np.uint8)
    m[y:y + s, x:x + s] = 1
    return m


def test_ap_integration_midpoint_widths():
    # single perfect detection on one GT -> AP 1.0
    assert _ap_from_points(np.array([1.0]), np.array([0.9]), 1) == 1.0
    # FP above the TP: r=[0,0,1], p=[0,0,.5] -> AP 0.25
    ap = _ap_from_points(np.array([0.0, 1.0]), np.array([0.95, 0.9]), 1)
    np.testing.assert_allclose(ap, 0.25)
    # FP below full recall doesn't reduce AP (zero step width)
    ap = _ap_from_points(np.array([1.0, 0.0]), np.array([0.9, 0.8]), 1)
    np.testing.assert_allclose(ap, 1.0)
    assert np.isnan(_ap_from_points(np.zeros(0), np.zeros(0), 0))
    assert _ap_from_points(np.zeros(0), np.zeros(0), 3) == 0.0


def test_evaluator_matching_ignore_and_group_rules():
    h = w = 40
    ev = CityscapesInstanceEvaluator(num_classes=2)
    gt_masks = np.stack([
        _sq(h, w, 0, 0, 10),    # GT1 class 1, area 100 (counted)
        _sq(h, w, 20, 20, 10),  # GT2 class 1, area 100 (counted)
        _sq(h, w, 0, 30, 5),    # GT3 class 1, area 25 (undersized -> ignore)
        _sq(h, w, 10, 20, 8),   # GT4 class 2, area 64... undersized!
    ])
    # make class-2 GT large enough to count
    gt_masks[3] = _sq(h, w, 10, 18, 12)  # 144 px
    gt_classes = np.array([1, 1, 1, 2])
    group = {1: _sq(h, w, 30, 0, 10).astype(bool)}  # "class-1 group" region
    void = _sq(h, w, 30, 20, 10).astype(bool)

    pred_masks = [
        _sq(h, w, 0, 0, 10),     # P1: exact GT1
        _sq(h, w, 0, 0, 10),     # P2: duplicate on GT1 -> FP
        _sq(h, w, 20, 25, 10),   # P3: IoU 1/3 with GT2 -> FP
        _sq(h, w, 30, 0, 10),    # P4: on the group region -> discarded
        _sq(h, w, 30, 20, 10),   # P5: on void -> discarded
        _sq(h, w, 0, 30, 5),     # P6: on undersized GT -> discarded
        _sq(h, w, 10, 18, 12),   # P7: exact class-2 GT
    ]
    pred_classes = np.array([1, 1, 1, 1, 1, 1, 2])
    pred_scores = np.array([0.9, 0.8, 0.7, 0.95, 0.95, 0.6, 0.9])
    ev.add_image(gt_masks, gt_classes, pred_masks, pred_classes, pred_scores,
                 void_mask=void, group_masks=group)
    res = ev.summarize(class_names=("c1", "c2"))
    # class 1 at every overlap: TP(.9), dup FP(.8), unmatched FP(.7), n_gt=2
    # -> operating points r=[0,.5,.5,.5], p=[1,1,.5,1/3] -> AP 0.5
    np.testing.assert_allclose(res["classes"]["c1"]["ap"], 0.5)
    np.testing.assert_allclose(res["classes"]["c1"]["ap50"], 0.5)
    np.testing.assert_allclose(res["classes"]["c2"]["ap"], 1.0)
    np.testing.assert_allclose(res["allAp"], 0.75)
    np.testing.assert_allclose(res["allAp50%"], 0.75)


def test_partial_overlap_threshold_sweep():
    """IoU 0.6 match: TP for overlaps 0.50/0.55 only -> AP = mean over 10
    thresholds of [1,1,0,...] = 0.2."""
    h = w = 40
    ev = CityscapesInstanceEvaluator(num_classes=1)
    gt = _sq(h, w, 0, 0, 20)  # 400 px
    # pred shifted: 20x20 at (0, 5): inter 300, union 500 -> IoU 0.6
    pred = _sq(h, w, 0, 5, 20)
    ev.add_image(gt[None], np.array([1]), [pred], np.array([1]),
                 np.array([0.9]))
    res = ev.summarize()
    np.testing.assert_allclose(res["classes"][1]["ap50"], 1.0)
    np.testing.assert_allclose(res["classes"][1]["ap"], 0.2)


def test_fixture_end_to_end_protocol(tmp_path):
    root = make_fake_cityscapes(tmp_path / "cs")
    from upsnet_tpu.data.cityscapes import Cityscapes

    ds = Cityscapes(city_cfg(root), split="val", training=True)
    gt = ds.load_gt(0)
    dets = []
    for j, c in enumerate(gt["classes"]):
        dets.append({
            "image_id": 0, "category": int(c), "score": 0.9,
            "bbox": gt["boxes"][j].tolist(),
            "segmentation": rle_mod.encode(gt["masks"][j]),
        })
    res = ds.evaluate_masks(dets)
    assert set(res) == {"allAp", "allAp50%", "classes"}
    np.testing.assert_allclose(res["allAp"], 1.0)
    # add a disjoint high-score car FP (on road, not void): car AP -> 0.25
    fp_mask = np.zeros_like(gt["masks"][0])
    fp_mask[2:12, 2:22] = 1  # 200 px on sky/road
    dets.append({"image_id": 0, "category": 3, "score": 0.95,
                 "bbox": [2, 2, 21, 11],
                 "segmentation": rle_mod.encode(fp_mask)})
    res2 = ds.evaluate_masks(dets)
    np.testing.assert_allclose(res2["classes"]["car"]["ap"], 0.25)
    np.testing.assert_allclose(res2["classes"]["person"]["ap"], 1.0)
    np.testing.assert_allclose(res2["allAp"], 0.625)
