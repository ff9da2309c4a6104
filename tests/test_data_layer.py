import dataclasses
import json
import os

import numpy as np
import pytest

from upsnet_tpu.config import default_config
from upsnet_tpu.data.coco import COCOPanoptic, rasterize_polygons
from upsnet_tpu.data.pipeline import Loader, collate
from upsnet_tpu.data.synthetic import SyntheticDataset
from upsnet_tpu.data.transforms import (
    compute_resize_scale,
    pick_bucket,
)
from upsnet_tpu.evaluation.panoptic_format import (
    build_panoptic_output,
    id_to_rgb,
    rgb_to_id,
)


def small_cfg(**kw):
    cfg = default_config()
    return cfg.replace(
        dataset=dataclasses.replace(
            cfg.dataset, num_classes=5, num_seg_classes=7, num_stuff=3, **kw
        ),
        train=dataclasses.replace(
            cfg.train,
            scales=(128,),
            max_size=160,
            image_buckets=((128, 160), (160, 128)),
            max_gt_instances=8,
        ),
        test=dataclasses.replace(
            cfg.test, scales=(128,), max_size=160,
            image_buckets=((128, 160), (160, 128)),
        ),
    )


def test_resize_scale_and_bucket():
    assert compute_resize_scale(480, 640, 800, 1333) == 800 / 480
    # cap by max_size
    s = compute_resize_scale(400, 1000, 800, 1333)
    assert abs(s - 1333 / 1000) < 1e-9
    assert pick_bucket(700, 1100, ((832, 1344), (1344, 832))) == (832, 1344)
    assert pick_bucket(1100, 700, ((832, 1344), (1344, 832))) == (1344, 832)


def test_synthetic_sample_contract():
    cfg = small_cfg()
    ds = SyntheticDataset(cfg, num_images=4, image_hw=(120, 150))
    s = ds.sample(0, np.random.RandomState(0))
    bh, bw = s["images"].shape[:2]
    assert (bh, bw) in ((128, 160), (160, 128))
    assert s["gt_masks"].shape == (8, bh // 4, bw // 4)
    assert s["seg_gt"].shape == (bh // 4, bw // 4)
    assert s["gt_valid"].any()
    # boxes within image extent
    rh, rw = s["im_hw"]
    v = s["gt_valid"]
    assert np.all(s["gt_boxes"][v][:, 2] <= rw - 1 + 1e-3)
    assert np.all(s["gt_boxes"][v][:, 3] <= rh - 1 + 1e-3)
    # masks roughly consistent with boxes at 1/4 scale
    for j in np.where(v)[0]:
        q = (s["gt_boxes"][j] / 4).astype(int)
        m = s["gt_masks"][j]
        assert m[max(q[1], 0) : q[3] + 1, max(q[0], 0) : q[2] + 1].mean() > 0.5
    # seg classes in range
    seg = s["seg_gt"]
    assert set(np.unique(seg)).issubset(set(range(7)) | {255})


def test_loader_batches_static_shapes():
    cfg = small_cfg()
    ds = SyntheticDataset(cfg, num_images=8, image_hw=(120, 150))
    loader = Loader(ds, batch_size=2, epochs=1, seed=0)
    batches = list(loader)
    assert len(batches) == 4
    for b in batches:
        assert b["images"].shape[0] == 2
        assert b["gt_boxes"].shape == (2, 8, 4)


def test_panoptic_format_roundtrip(rng):
    ids = rng.randint(0, 256**3, (16, 16)).astype(np.int64)
    np.testing.assert_array_equal(rgb_to_id(id_to_rgb(ids)), ids)


def test_build_panoptic_output():
    num_stuff = 2
    pan = np.zeros((20, 20), np.int32)  # stuff channel 0
    pan[0:4, 0:4] = 2  # instance slot 0 (channel num_stuff + 0)
    pan[10:, 10:] = 1  # stuff channel 1 (area 100 >= limit 50)
    pan[5, 5] = 4  # unknown channel (num_stuff + D=2) -> VOID
    det_classes = np.array([3, 1])
    det_keep = np.array([True, False])
    id_map, segs = build_panoptic_output(
        pan, num_stuff, det_classes, det_keep, stuff_area_limit=50,
        stuff_cat_ids=[100, 101], thing_cat_ids={1: 201, 2: 202, 3: 203, 4: 204},
    )
    assert id_map[5, 5] == 0  # VOID
    cats = {s["category_id"] for s in segs}
    assert 203 in cats  # instance of class 3
    assert 101 in cats  # big stuff segment
    assert 100 in cats  # stuff 0 area is large
    # instance pixels share one id
    inst_seg = [s for s in segs if s["isthing"]][0]
    assert (id_map == inst_seg["id"]).sum() == 16


def test_fake_coco_dataset(tmp_path):
    """Build a miniature on-disk COCO layout and load through COCOPanoptic."""
    import cv2

    root = tmp_path / "coco"
    (root / "annotations" / "panoptic_val2017").mkdir(parents=True)
    (root / "val2017").mkdir()
    h, w = 60, 80
    img = np.full((h, w, 3), 128, np.uint8)
    cv2.imwrite(str(root / "val2017" / "000001.jpg"), img)

    instances = {
        "images": [{"id": 1, "file_name": "000001.jpg", "height": h, "width": w}],
        "categories": [{"id": 7, "name": "thing_a"}, {"id": 9, "name": "thing_b"}],
        "annotations": [
            {
                "id": 1, "image_id": 1, "category_id": 9, "iscrowd": 0,
                "bbox": [10, 10, 20, 15], "area": 300,
                "segmentation": [[10, 10, 29, 10, 29, 24, 10, 24]],
            }
        ],
    }
    # panoptic PNG: segment id 5 = stuff cat 100, id 6 = the thing
    ids = np.zeros((h, w), np.int32)
    ids[:, :] = 5
    ids[10:25, 10:30] = 6
    rgb = id_to_rgb(ids)
    cv2.imwrite(
        str(root / "annotations" / "panoptic_val2017" / "000001.png"),
        rgb[:, :, ::-1],  # cv2 writes BGR
    )
    panoptic = {
        "images": instances["images"],
        "categories": [
            {"id": 7, "name": "thing_a", "isthing": 1},
            {"id": 9, "name": "thing_b", "isthing": 1},
            {"id": 100, "name": "stuff_x", "isthing": 0},
        ],
        "annotations": [
            {
                "image_id": 1, "file_name": "000001.png",
                "segments_info": [
                    {"id": 5, "category_id": 100, "iscrowd": 0, "area": int((ids == 5).sum())},
                    {"id": 6, "category_id": 9, "iscrowd": 0, "area": int((ids == 6).sum())},
                ],
            }
        ],
    }
    with open(root / "annotations" / "instances_val2017.json", "w") as f:
        json.dump(instances, f)
    with open(root / "annotations" / "panoptic_val2017.json", "w") as f:
        json.dump(panoptic, f)

    cfg = small_cfg(dataset_path=str(root), test_image_set="val2017")
    cfg = cfg.replace(dataset=dataclasses.replace(cfg.dataset, num_stuff=1))
    ds = COCOPanoptic(cfg, image_set="val2017", training=True)
    assert len(ds) == 1
    gt = ds.load_gt(0)
    assert gt["classes"].tolist() == [2]  # cat 9 -> label 2 (sorted ids)
    np.testing.assert_allclose(gt["boxes"][0], [10, 10, 29, 24])
    assert gt["masks"][0, 15, 15] == 1 and gt["masks"][0, 5, 5] == 0
    # semantic: stuff 0 outside, thing train id = num_stuff + label - 1 = 2
    assert gt["seg"][0, 0] == 0
    assert gt["seg"][15, 15] == 1 + 2 - 1  # num_stuff=1, label=2
    s = ds.sample(0, np.random.RandomState(0))
    assert s["gt_valid"].sum() == 1

    # perfect prediction -> PQ 1
    res = ds.evaluate_panoptic(
        [{
            "image_id": 1,
            "id_map": ids,
            "segments": [
                {"id": 5, "category_id": 100},
                {"id": 6, "category_id": 9},
            ],
        }]
    )
    assert abs(res["All"]["pq"] - 1.0) < 1e-9
    # box eval: exact detection -> AP 1
    res = ds.evaluate_boxes(
        [{"image_id": 1, "category": 2, "score": 0.9, "bbox": [10, 10, 29, 24]}]
    )
    assert abs(res["AP"] - 1.0) < 1e-6


def test_rasterize_polygons():
    m = rasterize_polygons([[2, 2, 10, 2, 10, 8, 2, 8]], 12, 14)
    assert m[5, 5] == 1 and m[0, 0] == 0
    assert m.sum() >= 9 * 7  # inclusive outline
