"""COCO panoptic format: id <-> RGB PNG, segment JSON, stuff-area filter.

Reference behavior (SURVEY.md §3.4 steps 4-5): panoptic prediction encoded
as a PNG with id = R + G*256 + B*256^2 plus a segments_info JSON; stuff
segments smaller than ``panoptic_stuff_area_limit`` are relabeled VOID.
"""

from __future__ import annotations

import numpy as np


def id_to_rgb(id_map: np.ndarray) -> np.ndarray:
    """(H, W) int32 -> (H, W, 3) uint8 with id = R + G*256 + B*256^2."""
    out = np.zeros(id_map.shape + (3,), np.uint8)
    out[..., 0] = id_map % 256
    out[..., 1] = (id_map // 256) % 256
    out[..., 2] = (id_map // (256 * 256)) % 256
    return out


def rgb_to_id(rgb: np.ndarray) -> np.ndarray:
    rgb = rgb.astype(np.int64)
    return rgb[..., 0] + 256 * rgb[..., 1] + 256 * 256 * rgb[..., 2]


def build_panoptic_output(
    pan_channel_map: np.ndarray,  # (H, W) channel indices from the device
    num_stuff: int,
    det_classes: np.ndarray,  # (D,) thing class ids (1-based detection labels)
    det_keep: np.ndarray,  # (D,) bool — instances present in the fusion
    stuff_area_limit: int,
    stuff_cat_ids,  # contiguous stuff channel -> dataset category id
    thing_cat_ids,  # 1-based det label -> dataset category id
) -> tuple[np.ndarray, list[dict]]:
    """Convert the device argmax channel map to (id_map, segments_info).

    Channels: [0, num_stuff) stuff classes, [num_stuff, num_stuff + D)
    instance slots, last = unknown -> VOID (id 0). Stuff segments below the
    area limit are relabeled VOID (reference behavior). Segment ids are
    assigned densely starting at 1.
    """
    h, w = pan_channel_map.shape
    d = det_classes.shape[0]
    unknown_ch = num_stuff + d
    id_map = np.zeros((h, w), np.int32)
    segments: list[dict] = []
    next_id = 1

    # instance segments (descending score order = channel order)
    for i in range(d):
        if not det_keep[i]:
            continue
        m = pan_channel_map == num_stuff + i
        area = int(m.sum())
        if area == 0:
            continue
        id_map[m] = next_id
        segments.append(
            {
                "id": next_id,
                "category_id": int(thing_cat_ids[int(det_classes[i])]),
                "area": area,
                "isthing": 1,
            }
        )
        next_id += 1

    # stuff segments (one per class), area-filtered
    for s in range(num_stuff):
        m = pan_channel_map == s
        area = int(m.sum())
        if area == 0:
            continue
        if area < stuff_area_limit:
            continue  # relabel VOID
        id_map[m] = next_id
        segments.append(
            {
                "id": next_id,
                "category_id": int(stuff_cat_ids[s]),
                "area": area,
                "isthing": 0,
            }
        )
        next_id += 1

    _ = unknown_ch  # unknown pixels stay VOID (id 0)
    return id_map, segments
