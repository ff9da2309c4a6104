"""Spatially-sharded panoptic fusion == single-device fusion (8-dev mesh)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from upsnet_tpu.models.upsnet import panoptic_fuse
from upsnet_tpu.parallel.mesh import make_mesh
from upsnet_tpu.parallel.spatial import spatial_panoptic_fuse


def test_spatial_fusion_matches_single_device(rng):
    mesh = make_mesh(8, spatial=8)  # 1 x 8: all devices on the model axis
    h, w, num_stuff, num_thing = 64, 48, 3, 4
    d = 6
    seg = jnp.asarray(rng.randn(h // 4, w // 4, num_stuff + num_thing)
                      .astype(np.float32))
    boxes = rng.uniform(0, 30, (d, 4)).astype(np.float32)
    boxes[:, 2:] = boxes[:, :2] + rng.uniform(8, 16, (d, 2))
    boxes = jnp.asarray(boxes)
    classes = jnp.asarray(rng.randint(1, num_thing + 1, d).astype(np.int32))
    masks = jnp.asarray((rng.randn(d, 28, 28) * 3).astype(np.float32))
    scores = jnp.asarray(np.linspace(0.95, 0.5, d).astype(np.float32))
    valid = jnp.asarray(np.array([True] * (d - 1) + [False]))

    ref_map, ref_keep = panoptic_fuse(
        seg, boxes, classes, masks, scores, valid,
        score_thresh=0.6, overlap_thresh=0.5, num_stuff=num_stuff,
    )
    got_map, got_keep = spatial_panoptic_fuse(
        mesh, seg, boxes, classes, masks, scores, valid,
        score_thresh=0.6, overlap_thresh=0.5, num_stuff=num_stuff,
    )
    np.testing.assert_array_equal(np.asarray(got_keep), np.asarray(ref_keep))
    np.testing.assert_array_equal(np.asarray(got_map), np.asarray(ref_map))
