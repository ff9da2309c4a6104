"""Synthetic dataset: deterministic random scenes with exact GT.

Serves three roles the reference covers with real COCO only:
  * unit/integration tests without datasets on disk;
  * the benchmark harness input (bench.py);
  * overfit sanity runs (train loss must go to ~0 on a fixed tiny set).

Scenes are axis-aligned rectangles ("things") over a striped stuff
background, so detection/segmentation GT is exact and a training run can be
validated end-to-end (loss -> 0, PQ -> 1 on the train set).
"""

from __future__ import annotations

import numpy as np

from upsnet_tpu.data.base import BaseDataset


class SyntheticDataset(BaseDataset):
    def __init__(self, cfg, num_images: int = 8, image_hw=(256, 320),
                 training: bool = True, seed: int = 0):
        super().__init__(cfg, training)
        self.num_images = num_images
        self.image_hw = image_hw
        self.seed = seed
        self.num_things = cfg.dataset.num_classes - 1
        self.num_stuff = cfg.dataset.num_stuff

    def __len__(self):
        return self.num_images

    def _rng(self, i: int):
        return np.random.RandomState(self.seed * 1000 + i)

    def _scene(self, i: int):
        rng = self._rng(i)
        h, w = self.image_hw
        img = np.zeros((h, w, 3), np.uint8)
        seg = np.zeros((h, w), np.int32)
        # striped stuff background
        n_bands = min(self.num_stuff, 4)
        for b in range(n_bands):
            y0, y1 = h * b // n_bands, h * (b + 1) // n_bands
            stuff_cls = b % self.num_stuff
            img[y0:y1] = (40 * (b + 1)) % 200 + 20
            seg[y0:y1] = stuff_cls
        n_inst = rng.randint(1, 4)
        boxes, classes, masks = [], [], []
        for k in range(n_inst):
            bw = rng.randint(w // 6, w // 3)
            bh = rng.randint(h // 6, h // 3)
            x1 = rng.randint(0, w - bw - 1)
            y1 = rng.randint(0, h - bh - 1)
            cls = rng.randint(1, self.num_things + 1)
            color = np.array(
                [50 + 60 * (cls % 3), 80 + 50 * (cls % 4), 120 + 40 * (cls % 2)],
                np.uint8,
            )
            img[y1 : y1 + bh, x1 : x1 + bw] = color
            m = np.zeros((h, w), np.uint8)
            m[y1 : y1 + bh, x1 : x1 + bw] = 1
            seg[y1 : y1 + bh, x1 : x1 + bw] = self.num_stuff + cls - 1
            boxes.append([x1, y1, x1 + bw - 1, y1 + bh - 1])
            classes.append(cls)
            masks.append(m)
        return img, {
            "boxes": np.array(boxes, np.float32).reshape(-1, 4),
            "classes": np.array(classes, np.int32),
            "masks": np.array(masks, np.uint8).reshape(-1, h, w),
            "seg": seg,
        }

    def load_image(self, i: int) -> np.ndarray:
        return self._scene(i)[0]

    def load_gt(self, i: int) -> dict:
        return self._scene(i)[1]
