"""Cityscapes dataset (fine annotations).

Reference: uber-research/UPSNet ``upsnet/dataset/cityscapes.py``
(SURVEY.md §2.4): 19 classes = 11 stuff (trainIds 0-10) + 8 things
(trainIds 11-18: person, rider, car, truck, bus, train, motorcycle,
bicycle); instance GT from ``*_instanceIds.png`` (id = labelId * 1000 + k
for things); eval via instance AP / mIoU / PQ — here through the
framework's own evaluators.

Expected layout:
  {root}/leftImg8bit/{split}/{city}/*_leftImg8bit.png
  {root}/gtFine/{split}/{city}/*_gtFine_labelIds.png / *_instanceIds.png

Framework conventions: detection labels 1..8 (thing trainId - 10);
semantic train ids = cityscapes trainIds (stuff first by construction).
"""

from __future__ import annotations

import glob
import os

import numpy as np

from upsnet_tpu.data.base import BaseDataset
from upsnet_tpu.evaluation.coco_eval import COCOEvaluator
from upsnet_tpu.evaluation import rle as rle_mod
from upsnet_tpu.evaluation.pq import PQStat, pq_compute_single_image, pq_summarize
from upsnet_tpu.evaluation.seg_eval import ConfusionMatrix

# labelId -> trainId (cityscapesScripts table, 255 = ignore)
LABEL_TO_TRAIN = np.full(256, 255, np.int32)
for lid, tid in {
    7: 0, 8: 1, 11: 2, 12: 3, 13: 4, 17: 5, 19: 6, 20: 7, 21: 8, 22: 9,
    23: 10, 24: 11, 25: 12, 26: 13, 27: 14, 28: 15, 31: 16, 32: 17, 33: 18,
}.items():
    LABEL_TO_TRAIN[lid] = tid

THING_TRAIN_IDS = tuple(range(11, 19))
NUM_STUFF = 11
# labelIds of things, aligned with detection labels 1..8
THING_LABEL_IDS = (24, 25, 26, 27, 28, 31, 32, 33)


class Cityscapes(BaseDataset):
    def __init__(self, cfg, split: str | None = None, training: bool = True):
        super().__init__(cfg, training)
        self.root = cfg.dataset.dataset_path
        self.split = split or ("train" if training else "val")
        pattern = os.path.join(
            self.root, "leftImg8bit", self.split, "*", "*_leftImg8bit.png"
        )
        self.files = sorted(glob.glob(pattern))
        if not self.files:
            raise FileNotFoundError(pattern)

    def __len__(self):
        return len(self.files)

    def image_id(self, i: int):
        return i

    def _gt_path(self, i: int, kind: str) -> str:
        f = self.files[i]
        rel = os.path.relpath(f, os.path.join(self.root, "leftImg8bit"))
        rel = rel.replace("_leftImg8bit.png", f"_gtFine_{kind}.png")
        return os.path.join(self.root, "gtFine", rel)

    def load_image(self, i: int) -> np.ndarray:
        import cv2

        img = cv2.imread(self.files[i], cv2.IMREAD_COLOR)
        if img is None:
            raise FileNotFoundError(self.files[i])
        return img

    def load_gt(self, i: int) -> dict:
        import cv2

        label = cv2.imread(self._gt_path(i, "labelIds"), cv2.IMREAD_UNCHANGED)
        inst = cv2.imread(self._gt_path(i, "instanceIds"), cv2.IMREAD_UNCHANGED)
        inst = inst.astype(np.int32)
        h, w = label.shape[:2]
        seg = LABEL_TO_TRAIN[label.astype(np.int32)]
        boxes, classes, masks = [], [], []
        for iid in np.unique(inst):
            if iid < 1000:  # stuff / group labels carry no instance id
                continue
            label_id = iid // 1000
            if label_id not in THING_LABEL_IDS:
                continue
            m = (inst == iid).astype(np.uint8)
            ys, xs = np.nonzero(m)
            if len(ys) < 8:
                continue
            boxes.append([xs.min(), ys.min(), xs.max(), ys.max()])
            classes.append(THING_LABEL_IDS.index(label_id) + 1)
            masks.append(m)
        return {
            "boxes": np.array(boxes, np.float32).reshape(-1, 4),
            "classes": np.array(classes, np.int32),
            "masks": np.array(masks, np.uint8).reshape(-1, h, w),
            "seg": seg,
        }

    # ------------------------------------------------------------------
    def evaluate_ssegs(self, seg_preds) -> dict:
        cm = ConfusionMatrix(self.cfg.dataset.num_seg_classes)
        for p in seg_preds:
            i = int(p["image_id"])
            import cv2

            label = cv2.imread(self._gt_path(i, "labelIds"), cv2.IMREAD_UNCHANGED)
            gt = LABEL_TO_TRAIN[label.astype(np.int32)]
            cm.update(gt, p["pred"])
        return {"mIoU": cm.mean_iou(), "pixel_acc": cm.pixel_accuracy()}

    def evaluate_boxes(self, detections) -> dict:
        ev = COCOEvaluator("bbox", max_dets=self.cfg.test.max_det)
        self._add_gt(ev, want_masks=False)
        for d in detections:
            x1, y1, x2, y2 = d["bbox"]
            ev.add_det({"image_id": d["image_id"], "category_id": int(d["category"]),
                        "score": float(d["score"]),
                        "bbox": [x1, y1, x2 - x1 + 1, y2 - y1 + 1]})
        return ev.summarize()

    def evaluate_masks(self, detections) -> dict:
        ev = COCOEvaluator("segm", max_dets=self.cfg.test.max_det)
        self._add_gt(ev, want_masks=True)
        for d in detections:
            x1, y1, x2, y2 = d["bbox"]
            ev.add_det({"image_id": d["image_id"], "category_id": int(d["category"]),
                        "score": float(d["score"]),
                        "segmentation": d["segmentation"],
                        "bbox": [x1, y1, x2 - x1 + 1, y2 - y1 + 1]})
        return ev.summarize()

    def _add_gt(self, ev: COCOEvaluator, want_masks: bool):
        for i in range(len(self.files)):
            gt = self.load_gt(i)
            for j in range(len(gt["classes"])):
                x1, y1, x2, y2 = gt["boxes"][j]
                g = {"image_id": i, "category_id": int(gt["classes"][j]),
                     "bbox": [x1, y1, x2 - x1 + 1, y2 - y1 + 1],
                     "area": float((x2 - x1 + 1) * (y2 - y1 + 1)), "iscrowd": 0}
                if want_masks:
                    g["segmentation"] = rle_mod.encode(gt["masks"][j])
                ev.add_gt(g)

    def evaluate_panoptic(self, pan_results) -> dict:
        """GT panoptic map built from labelIds + instanceIds on the fly."""
        stat = PQStat()
        for p in pan_results:
            i = int(p["image_id"])
            import cv2

            label = cv2.imread(self._gt_path(i, "labelIds"), cv2.IMREAD_UNCHANGED)
            inst = cv2.imread(
                self._gt_path(i, "instanceIds"), cv2.IMREAD_UNCHANGED
            ).astype(np.int64)
            train = LABEL_TO_TRAIN[label.astype(np.int32)]
            gt_map = np.zeros_like(inst)
            gt_segments = {}
            next_id = 1
            for tid in range(NUM_STUFF):
                m = train == tid
                if m.sum() == 0:
                    continue
                gt_map[m] = next_id
                gt_segments[next_id] = {"category_id": tid, "iscrowd": 0}
                next_id += 1
            for iid in np.unique(inst):
                if iid < 1000 or (iid // 1000) not in THING_LABEL_IDS:
                    continue
                m = inst == iid
                gt_map[m] = next_id
                cat = NUM_STUFF + THING_LABEL_IDS.index(iid // 1000)
                gt_segments[next_id] = {"category_id": cat, "iscrowd": 0}
                next_id += 1
            pred_segments = {
                s["id"]: {"category_id": s["category_id"]} for s in p["segments"]
            }
            stat += pq_compute_single_image(
                gt_map, p["id_map"], gt_segments, pred_segments
            )
        things = set(range(NUM_STUFF, 19))
        stuff = set(range(NUM_STUFF))
        return pq_summarize(stat, things, stuff)
