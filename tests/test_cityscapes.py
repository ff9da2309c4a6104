"""Cityscapes dataset parsing against a miniature on-disk gtFine layout."""

import dataclasses

import numpy as np

from upsnet_tpu.config import default_config
from upsnet_tpu.data.cityscapes import LABEL_TO_TRAIN, Cityscapes


def make_fake_cityscapes(root, h=64, w=96):
    import cv2

    img_dir = root / "leftImg8bit" / "val" / "city0"
    gt_dir = root / "gtFine" / "val" / "city0"
    img_dir.mkdir(parents=True)
    gt_dir.mkdir(parents=True)
    img = np.full((h, w, 3), 100, np.uint8)
    cv2.imwrite(str(img_dir / "a_000000_leftImg8bit.png"), img)

    label = np.full((h, w), 7, np.uint8)  # road (trainId 0)
    label[: h // 4] = 23  # sky (trainId 10)
    label[40:60, 10:40] = 26  # car (trainId 13)
    label[40:56, 50:80] = 24  # person (trainId 11)
    inst = label.astype(np.int32) * 1  # stuff keeps labelId
    inst[40:60, 10:40] = 26 * 1000 + 0  # car instance 0
    inst[40:56, 50:80] = 24 * 1000 + 0  # person instance 0
    cv2.imwrite(str(gt_dir / "a_000000_gtFine_labelIds.png"), label)
    cv2.imwrite(
        str(gt_dir / "a_000000_gtFine_instanceIds.png"),
        inst.astype(np.uint16),
    )
    return root


def city_cfg(root):
    cfg = default_config()
    return cfg.replace(
        dataset=dataclasses.replace(
            cfg.dataset, dataset="cityscapes", dataset_path=str(root),
            num_classes=9, num_seg_classes=19, num_stuff=11,
        ),
        test=dataclasses.replace(
            cfg.test, scales=(64,), max_size=128,
            image_buckets=((64, 128), (128, 64)),
        ),
        train=dataclasses.replace(
            cfg.train, scales=(64,), max_size=128,
            image_buckets=((64, 128), (128, 64)), max_gt_instances=8,
        ),
    )


def test_label_table():
    assert LABEL_TO_TRAIN[7] == 0  # road
    assert LABEL_TO_TRAIN[26] == 13  # car
    assert LABEL_TO_TRAIN[0] == 255  # unlabeled -> ignore


def test_fake_cityscapes_gt(tmp_path):
    root = make_fake_cityscapes(tmp_path / "cs")
    ds = Cityscapes(city_cfg(root), split="val", training=True)
    assert len(ds) == 1
    gt = ds.load_gt(0)
    # car -> det label 3, person -> det label 1 (THING_LABEL_IDS order)
    assert sorted(gt["classes"].tolist()) == [1, 3]
    assert gt["seg"][0, 0] == 10  # sky
    assert gt["seg"][50, 20] == 13  # car
    assert gt["seg"][63, 0] == 0  # road
    car = gt["masks"][gt["classes"].tolist().index(3)]
    assert car[50, 20] == 1 and car[0, 0] == 0
    # boxes tight around instances
    ci = gt["classes"].tolist().index(3)
    np.testing.assert_array_equal(gt["boxes"][ci], [10, 40, 39, 59])

    s = ds.sample(0, np.random.RandomState(0))
    assert s["gt_valid"].sum() == 2

    # perfect panoptic prediction -> PQ 1 through the default evaluators
    seg = gt["seg"]
    gt_map = np.zeros_like(seg, np.int64)
    segments = []
    nid = 1
    for tid in (0, 10):
        gt_map[seg == tid] = nid
        segments.append({"id": nid, "category_id": tid})
        nid += 1
    for j in range(2):
        m = gt["masks"][j] > 0
        gt_map[m] = nid
        segments.append({"id": nid, "category_id": 11 + int(gt["classes"][j]) - 1})
        nid += 1
    res = ds.evaluate_panoptic(
        [{"image_id": 0, "id_map": gt_map, "segments": segments}]
    )
    assert abs(res["All"]["pq"] - 1.0) < 1e-9
    res = ds.evaluate_ssegs([{"image_id": 0, "pred": seg}])
    assert abs(res["mIoU"] - 1.0) < 1e-9
