"""Panoptic file artifacts: COCO-format PNG + segments JSON (VERDICT r1
item #6). The written directory must round-trip losslessly and feed
evaluate_panoptic identically to the in-memory path."""

import numpy as np

from upsnet_tpu.evaluation.panoptic_format import (
    id_to_rgb,
    read_panoptic_results,
    rgb_to_id,
    write_panoptic_results,
)


def _fake_pan_results(rng, n=3):
    out = []
    for i in range(n):
        id_map = rng.randint(0, 70000, size=(24, 31)).astype(np.int32)
        ids = sorted(set(np.unique(id_map)) - {0})
        segments = [
            {"id": int(s), "category_id": int(s % 7) + 1,
             "area": int((id_map == s).sum()), "isthing": int(s % 2)}
            for s in ids[:20]
        ]
        # only keep listed segments in the map (mimic real outputs)
        keep = {s["id"] for s in segments}
        id_map = np.where(np.isin(id_map, list(keep)), id_map, 0)
        out.append({"image_id": 100 + i, "id_map": id_map,
                    "segments": segments})
    return out


def test_id_rgb_roundtrip(rng):
    ids = rng.randint(0, 256**3, size=(16, 16)).astype(np.int64)
    np.testing.assert_array_equal(rgb_to_id(id_to_rgb(ids)), ids)


def test_write_read_roundtrip(rng, tmp_path):
    results = _fake_pan_results(rng)
    json_path = write_panoptic_results(str(tmp_path), results)
    back = read_panoptic_results(json_path)
    assert len(back) == len(results)
    for a, b in zip(results, back):
        assert a["image_id"] == b["image_id"]
        np.testing.assert_array_equal(a["id_map"], b["id_map"])
        assert [s["id"] for s in a["segments"]] == [
            s["id"] for s in b["segments"]
        ]
        assert [s["category_id"] for s in a["segments"]] == [
            s["category_id"] for s in b["segments"]
        ]


def test_evaluate_panoptic_accepts_file_path(rng, tmp_path):
    """File-based evaluation == in-memory evaluation (BaseDataset path)."""
    import dataclasses

    from upsnet_tpu.config import default_config
    from upsnet_tpu.data.synthetic import SyntheticDataset

    cfg = default_config()
    cfg = cfg.replace(
        dataset=dataclasses.replace(
            cfg.dataset, num_classes=5, num_seg_classes=7, num_stuff=3),
        train=dataclasses.replace(
            cfg.train, scales=(64,), max_size=80,
            image_buckets=((64, 80), (80, 64)), max_gt_instances=8),
        test=dataclasses.replace(
            cfg.test, scales=(64,), max_size=80,
            image_buckets=((64, 80), (80, 64))),
    )
    ds = SyntheticDataset(cfg, num_images=2, image_hw=(64, 80), training=True)
    # synthesize predictions straight from GT (perfect prediction)
    pans = []
    for i in range(2):
        gt = ds.load_gt(i)
        seg = gt["seg"]
        id_map = np.zeros(seg.shape, np.int32)
        segments = []
        nid = 1
        for s in range(3):
            m = seg == s
            if not m.any():
                continue
            id_map[m] = nid
            segments.append({"id": nid, "category_id": s, "area": int(m.sum()),
                             "isthing": 0})
            nid += 1
        for j, c in enumerate(gt["classes"]):
            m = gt["masks"][j] > 0
            id_map[m] = nid
            segments.append({"id": nid, "category_id": 3 + int(c) - 1,
                             "area": int(m.sum()), "isthing": 1})
            nid += 1
        pans.append({"image_id": i, "id_map": id_map, "segments": segments})

    mem = ds.evaluate_panoptic(pans)
    json_path = write_panoptic_results(str(tmp_path), pans)
    filed = ds.evaluate_panoptic(json_path)
    np.testing.assert_allclose(filed["All"]["pq"], mem["All"]["pq"])
    np.testing.assert_allclose(filed["Things"]["pq"], mem["Things"]["pq"])
    assert mem["All"]["pq"] > 0.9  # perfect prediction sanity
