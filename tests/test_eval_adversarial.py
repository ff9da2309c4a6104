"""Adversarial eval-protocol fixtures with hand-computed expected values
(VERDICT r1 item #5): crowd GT, ignore-area GT, duplicate detections,
VOID-heavy panoptic maps — the corners where pycocotools/panopticapi rules
move AP/PQ by tenths.

Expected numbers below are hand-derived from the pycocotools matching
rules (greedy score-ordered matching, crowd = ignore with IoA denominator,
area-range ignore, per-image maxDets truncation, 101-point interpolation)
and the panopticapi rules (IoU > 0.5 on union minus pred∩VOID, crowd GT
skipped, unmatched preds mostly over VOID/same-cat-crowd not FPs).
"""

import numpy as np
import pytest

from upsnet_tpu.evaluation.coco_eval import COCOEvaluator, format_table
from upsnet_tpu.evaluation.pq import (
    PQStat,
    pq_compute_single_image,
    pq_summarize,
)


def _bbox_fixture():
    ev = COCOEvaluator("bbox", max_dets=100)
    img = 1
    # GT A: medium (40x40=1600), GT B: crowd, GT C: small (4x4=16)
    ev.add_gt({"image_id": img, "category_id": 1, "bbox": [0, 0, 40, 40],
               "area": 1600.0, "iscrowd": 0})
    ev.add_gt({"image_id": img, "category_id": 1, "bbox": [60, 0, 50, 10],
               "area": 500.0, "iscrowd": 1})
    ev.add_gt({"image_id": img, "category_id": 1, "bbox": [120, 0, 4, 4],
               "area": 16.0, "iscrowd": 0})
    # D1 exact match on A; D2 duplicate (IoU 0.905 with A) -> FP;
    # D3 fully inside the crowd -> ignored; D4 exact match on C.
    ev.add_det({"image_id": img, "category_id": 1, "score": 0.9,
                "bbox": [0, 0, 40, 40]})
    ev.add_det({"image_id": img, "category_id": 1, "score": 0.8,
                "bbox": [2, 0, 40, 40]})
    ev.add_det({"image_id": img, "category_id": 1, "score": 0.7,
                "bbox": [62, 2, 46, 6]})
    ev.add_det({"image_id": img, "category_id": 1, "score": 0.6,
                "bbox": [120, 0, 4, 4]})
    return ev


def test_coco_eval_crowd_duplicate_area_rules():
    res = _bbox_fixture().summarize()
    # all thresholds identical here: D1 TP (IoU 1), D2 FP, D3 crowd-ignored,
    # D4 TP; n_gt=2; P/R curve -> AP = (51*1 + 50*(2/3)) / 101
    expect_ap = (51 * 1.0 + 50 * (2.0 / 3.0)) / 101
    np.testing.assert_allclose(res["AP"], expect_ap, atol=1e-9)
    np.testing.assert_allclose(res["AP50"], expect_ap, atol=1e-9)
    np.testing.assert_allclose(res["AP75"], expect_ap, atol=1e-9)
    # small range: only C counts as GT; D1 matches ignored A, D2's area is
    # out of range (unmatched -> ignored), D3 crowd, D4 TP => perfect
    np.testing.assert_allclose(res["APs"], 1.0, atol=1e-9)
    np.testing.assert_allclose(res["ARs"], 1.0, atol=1e-9)
    # medium range: A counts; D1 TP then D2 FP -> recall hits 1.0 at the
    # first det, 101-pt AP = 1.0
    np.testing.assert_allclose(res["APm"], 1.0, atol=1e-9)
    np.testing.assert_allclose(res["ARm"], 1.0, atol=1e-9)
    # no large GT anywhere -> NaN (pycocotools prints -1)
    assert np.isnan(res["APl"]) and np.isnan(res["ARl"])
    # AR@1: only D1 kept per image -> recall 1/2; AR@10/100: full recall
    np.testing.assert_allclose(res["AR@1"], 0.5, atol=1e-9)
    np.testing.assert_allclose(res["AR@10"], 1.0, atol=1e-9)
    np.testing.assert_allclose(res["AR@100"], 1.0, atol=1e-9)


def test_coco_eval_12_metric_table_shape():
    res = _bbox_fixture().summarize()
    for k in ("AP", "AP50", "AP75", "APs", "APm", "APl",
              "AR@1", "AR@10", "AR@100", "ARs", "ARm", "ARl"):
        assert k in res, k
    table = format_table(res, 100)
    assert len(table.splitlines()) == 12
    assert "IoU=0.50:0.95" in table and "area=medium" in table


def test_duplicate_detection_is_fp_not_rematch():
    """A second high-IoU det on an already-matched (non-crowd) GT must be
    an FP — only crowd GT allows multiple matches."""
    ev = COCOEvaluator("bbox", max_dets=100)
    ev.add_gt({"image_id": 0, "category_id": 1, "bbox": [0, 0, 10, 10],
               "area": 100.0, "iscrowd": 0})
    for s in (0.9, 0.8):
        ev.add_det({"image_id": 0, "category_id": 1, "score": s,
                    "bbox": [0, 0, 10, 10]})
    res = ev.summarize()
    # P/R: tp=[1,1], fp=[0,1]; precision envelope [1, 0.5]; recall [1, 1]
    # -> all 101 recall points read precision 1.0
    np.testing.assert_allclose(res["AP"], 1.0, atol=1e-9)
    # crowd variant: both dets ignored-matched, no FP
    ev2 = COCOEvaluator("bbox", max_dets=100)
    ev2.add_gt({"image_id": 0, "category_id": 1, "bbox": [0, 0, 10, 10],
                "area": 100.0, "iscrowd": 1})
    ev2.add_gt({"image_id": 0, "category_id": 1, "bbox": [30, 0, 10, 10],
                "area": 100.0, "iscrowd": 0})
    for s in (0.9, 0.8):
        ev2.add_det({"image_id": 0, "category_id": 1, "score": s,
                     "bbox": [0, 0, 10, 10]})
    ev2.add_det({"image_id": 0, "category_id": 1, "score": 0.7,
                 "bbox": [30, 0, 10, 10]})
    res2 = ev2.summarize()
    np.testing.assert_allclose(res2["AP"], 1.0, atol=1e-9)


def test_pq_void_crowd_adversarial():
    """10x10 map. GT: thing(cat2) rows 0-3; crowd(cat2) rows 4-5;
    stuff(cat1) rows 6-7; VOID row 8; stuff(cat3) row 9.
    Pred: cat2 rows 0-4 (IoU 0.8 TP); cat2 row 5 (on crowd -> ignored);
    cat1 rows 6-7 (IoU 1.0 TP); cat2 row 8 (all VOID -> ignored);
    cat2 row 9 (on cat3 GT -> real FP; cat3 GT -> FN)."""
    gt = np.zeros((10, 10), np.int64)
    gt[0:4] = 1
    gt[4:6] = 2
    gt[6:8] = 3
    gt[8] = 0  # VOID
    gt[9] = 4
    gt_segments = {
        1: {"category_id": 2, "iscrowd": 0},
        2: {"category_id": 2, "iscrowd": 1},
        3: {"category_id": 1, "iscrowd": 0},
        4: {"category_id": 3, "iscrowd": 0},
    }
    pred = np.zeros((10, 10), np.int64)
    pred[0:5] = 10
    pred[5] = 11
    pred[6:8] = 12
    pred[8] = 13
    pred[9] = 14
    pred_segments = {
        10: {"category_id": 2},
        11: {"category_id": 2},
        12: {"category_id": 1},
        13: {"category_id": 2},
        14: {"category_id": 2},
    }
    stat = PQStat()
    stat += pq_compute_single_image(gt, pred, gt_segments, pred_segments)
    assert stat.tp[2] == 1 and stat.fp[2] == 1 and stat.fn[2] == 0
    assert stat.tp[1] == 1 and stat.fp[1] == 0 and stat.fn[1] == 0
    assert stat.fn[3] == 1 and stat.tp[3] == 0
    np.testing.assert_allclose(stat.iou_sum[2], 0.8)

    res = pq_summarize(stat, thing_categories={2, 3}, stuff_categories={1})
    pq2 = 0.8 / (1 + 0.5)  # TP iou / (TP + FP/2)
    np.testing.assert_allclose(res["per_category"][2]["pq"], pq2)
    np.testing.assert_allclose(res["per_category"][1]["pq"], 1.0)
    np.testing.assert_allclose(res["per_category"][3]["pq"], 0.0)
    np.testing.assert_allclose(res["All"]["pq"], (pq2 + 1.0 + 0.0) / 3)
    np.testing.assert_allclose(res["Things"]["pq"], (pq2 + 0.0) / 2)
    np.testing.assert_allclose(res["Stuff"]["pq"], 1.0)
    np.testing.assert_allclose(res["per_category"][2]["sq"], 0.8)
    np.testing.assert_allclose(res["per_category"][2]["rq"], 1 / 1.5)


def test_pq_void_majority_union_excludes_void():
    """Union for IoU excludes the prediction's VOID overlap: a pred that
    half-covers VOID can still match with IoU computed on the non-void
    union (panopticapi behavior)."""
    gt = np.zeros((4, 10), np.int64)
    gt[0:2] = 1  # cat 5, 20 px
    # rows 2-3 VOID
    pred = np.zeros((4, 10), np.int64)
    pred[0:2] = 7
    pred[2:4] = 7  # 40 px pred, half on VOID
    stat = pq_compute_single_image(
        gt, pred, {1: {"category_id": 5, "iscrowd": 0}},
        {7: {"category_id": 5}},
    )
    # inter 20, union = 20 + 40 - 20 - void_inter(20) = 20 -> IoU 1.0
    assert stat.tp[5] == 1
    np.testing.assert_allclose(stat.iou_sum[5], 1.0)
