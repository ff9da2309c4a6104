import numpy as np

from upsnet_tpu.evaluation import rle
from upsnet_tpu.evaluation.coco_eval import COCOEvaluator, box_iou_xywh
from upsnet_tpu.evaluation.pq import PQStat, pq_compute_single_image, pq_summarize
from upsnet_tpu.evaluation.seg_eval import ConfusionMatrix


def test_rle_roundtrip(rng):
    for _ in range(5):
        mask = (rng.rand(37, 53) > 0.7).astype(np.uint8)
        enc = rle.encode(mask)
        dec = rle.decode(enc)
        np.testing.assert_array_equal(mask, dec)
        assert rle.area(enc) == mask.sum()


def test_rle_empty_and_full():
    for mask in (np.zeros((5, 7), np.uint8), np.ones((5, 7), np.uint8)):
        np.testing.assert_array_equal(rle.decode(rle.encode(mask)), mask)


def test_rle_iou(rng):
    a = np.zeros((20, 20), np.uint8)
    b = np.zeros((20, 20), np.uint8)
    a[0:10, 0:10] = 1
    b[5:15, 0:10] = 1
    ra, rb = rle.encode(a), rle.encode(b)
    assert abs(rle.iou(ra, rb) - 50.0 / 150.0) < 1e-9
    assert abs(rle.iou(ra, rb, iscrowd=True) - 0.5) < 1e-9
    assert rle.intersection_area(ra, rb) == 50


def test_pq_perfect_prediction():
    gt = np.zeros((10, 10), np.int32)
    gt[:5] = 1
    gt[5:] = 2
    segs = {1: {"category_id": 10}, 2: {"category_id": 20}}
    stat = pq_compute_single_image(gt, gt.copy(), segs, dict(segs))
    res = pq_summarize(stat)
    assert abs(res["All"]["pq"] - 1.0) < 1e-9
    assert res["All"]["n"] == 2


def test_pq_half_miss():
    gt = np.zeros((10, 10), np.int32)
    gt[:, :] = 1
    pred = np.zeros((10, 10), np.int32)
    pred[:5] = 1  # half covered, iou 0.5 -> NOT a match (needs > 0.5)
    stat = pq_compute_single_image(
        gt, pred, {1: {"category_id": 7}}, {1: {"category_id": 7}}
    )
    res = pq_summarize(stat)
    assert res["All"]["pq"] == 0.0
    # slightly more than half -> match with that IoU
    pred[:6] = 1
    stat = pq_compute_single_image(
        gt, pred, {1: {"category_id": 7}}, {1: {"category_id": 7}}
    )
    res = pq_summarize(stat)
    assert abs(res["All"]["pq"] - 0.6) < 1e-9


def test_pq_void_and_crowd():
    gt = np.zeros((10, 10), np.int32)  # all VOID
    pred = np.zeros((10, 10), np.int32)
    pred[:, :] = 5
    # prediction entirely over void -> not counted as FP
    stat = pq_compute_single_image(gt, pred, {}, {5: {"category_id": 3}})
    assert stat.fp[3] == 0
    # crowd GT of same category absorbs the prediction too
    gt2 = np.full((10, 10), 9, np.int32)
    stat = pq_compute_single_image(
        gt2, pred, {9: {"category_id": 3, "iscrowd": 1}}, {5: {"category_id": 3}}
    )
    assert stat.fp[3] == 0 and stat.fn[3] == 0


def test_confusion_matrix_miou():
    cm = ConfusionMatrix(3)
    gt = np.array([[0, 0, 1, 1, 2, 255]])
    pred = np.array([[0, 1, 1, 1, 2, 0]])
    cm.update(gt, pred)
    iou = cm.iou_per_class()
    assert abs(iou[0] - 1 / 2) < 1e-9  # 1 inter, union 2
    assert abs(iou[1] - 2 / 3) < 1e-9
    assert abs(iou[2] - 1.0) < 1e-9


def test_box_iou_xywh():
    d = np.array([[0, 0, 10, 10]], np.float64)
    g = np.array([[5, 0, 10, 10]], np.float64)
    iou = box_iou_xywh(d, g, [0])
    assert abs(iou[0, 0] - 50 / 150) < 1e-9


def test_coco_eval_perfect_detection():
    ev = COCOEvaluator("bbox")
    for img in range(3):
        ev.add_gt({"image_id": img, "category_id": 1,
                   "bbox": [10, 10, 20, 20], "area": 400, "iscrowd": 0})
        ev.add_det({"image_id": img, "category_id": 1,
                    "bbox": [10, 10, 20, 20], "score": 0.9})
    res = ev.summarize()
    assert abs(res["AP"] - 1.0) < 1e-6
    assert abs(res["AP50"] - 1.0) < 1e-6


def test_coco_eval_fp_lowers_ap():
    ev = COCOEvaluator("bbox")
    ev.add_gt({"image_id": 0, "category_id": 1, "bbox": [10, 10, 20, 20],
               "area": 400, "iscrowd": 0})
    # high-scoring false positive + correct det
    ev.add_det({"image_id": 0, "category_id": 1, "bbox": [100, 100, 20, 20],
                "score": 0.95})
    ev.add_det({"image_id": 0, "category_id": 1, "bbox": [10, 10, 20, 20],
                "score": 0.9})
    res = ev.summarize()
    assert 0.3 < res["AP"] < 0.7  # precision envelope ~0.5


def test_coco_eval_crowd_not_fp():
    ev = COCOEvaluator("bbox")
    ev.add_gt({"image_id": 0, "category_id": 1, "bbox": [0, 0, 50, 50],
               "area": 2500, "iscrowd": 1})
    ev.add_gt({"image_id": 0, "category_id": 1, "bbox": [100, 100, 10, 10],
               "area": 100, "iscrowd": 0})
    ev.add_det({"image_id": 0, "category_id": 1, "bbox": [5, 5, 40, 40],
                "score": 0.99})  # inside crowd -> ignored
    ev.add_det({"image_id": 0, "category_id": 1, "bbox": [100, 100, 10, 10],
                "score": 0.9})
    res = ev.summarize()
    assert abs(res["AP"] - 1.0) < 1e-6


def test_native_rle_matches_numpy(rng):
    """When the C++ codec is built, it must be byte-identical to numpy."""
    from upsnet_tpu.evaluation import rle_native

    if not rle_native.available():
        import pytest

        pytest.skip("native librle.so not built")
    for _ in range(3):
        mask = (rng.rand(41, 57) > 0.6).astype(np.uint8)
        counts_np = rle.mask_to_counts(mask)  # dispatches to native
        # force-numpy reference
        flat = np.asfortranarray(mask).reshape(-1, order="F")
        change = np.flatnonzero(flat[1:] != flat[:-1]) + 1
        idx = np.concatenate([[0], change, [flat.size]])
        ref_counts = np.diff(idx).astype(np.int64)
        if flat[0] == 1:
            ref_counts = np.concatenate([[0], ref_counts])
        np.testing.assert_array_equal(np.asarray(counts_np), ref_counts)
        enc_nat = rle_native.encode_counts(ref_counts)
        # numpy string encoder (bypass dispatch by inlining the algorithm)
        out = bytearray()
        cl = [int(c) for c in ref_counts]
        for i, x in enumerate(cl):
            if i > 2:
                x -= cl[i - 2]
            more = True
            while more:
                c = x & 0x1F
                x >>= 5
                more = not ((x == 0 and not (c & 0x10)) or (x == -1 and (c & 0x10)))
                if more:
                    c |= 0x20
                out.append(c + 48)
        assert enc_nat == bytes(out)
        np.testing.assert_array_equal(
            rle_native.decode_counts(enc_nat), ref_counts
        )
        np.testing.assert_array_equal(
            rle_native.counts_to_mask(ref_counts, mask.shape), mask
        )
        a2 = (rng.rand(41, 57) > 0.6).astype(np.uint8)
        ca2 = rle_native.mask_to_counts(a2)
        assert rle_native.intersection(ref_counts, ca2) == int(
            np.sum(mask & a2)
        )
