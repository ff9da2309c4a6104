"""End-to-end evaluation loop (the reference's test entry, SURVEY.md §3.2).

Runs the jitted predict step over a dataset, maps padded device outputs back
to original-image coordinates on the host, and feeds the four evaluators:
boxes (AP), masks (AP), semantic (mIoU), panoptic (PQ).

Host work is limited to: coordinate unscaling, final-resolution mask paste +
RLE encode, nearest-resize of the 1/4-scale semantic/panoptic maps, and
panoptic segment bookkeeping — matching the north-star's "no mask tensors
round-trip until PNG encode".
"""

from __future__ import annotations

import numpy as np

from upsnet_tpu.config.defaults import Config
from upsnet_tpu.evaluation import rle as rle_mod
from upsnet_tpu.evaluation.panoptic_format import build_panoptic_output
from upsnet_tpu.models.registry import get_model
from upsnet_tpu.ops.anchors import pyramid_anchors


def paste_mask_full(mask_prob: np.ndarray, box: np.ndarray, hw) -> np.ndarray:
    """Host-side Detectron-style paste: resize M x M probs to the box size,
    threshold at 0.5 into a full-resolution canvas."""
    import cv2

    h, w = hw
    x1, y1, x2, y2 = box
    x1i, y1i = int(np.floor(x1)), int(np.floor(y1))
    x2i, y2i = int(np.ceil(x2)), int(np.ceil(y2))
    bw = max(x2i - x1i + 1, 1)
    bh = max(y2i - y1i + 1, 1)
    m = cv2.resize(mask_prob, (bw, bh), interpolation=cv2.INTER_LINEAR)
    out = np.zeros((h, w), np.uint8)
    xs0, ys0 = max(x1i, 0), max(y1i, 0)
    xs1, ys1 = min(x2i + 1, w), min(y2i + 1, h)
    if xs1 > xs0 and ys1 > ys0:
        out[ys0:ys1, xs0:xs1] = (
            m[ys0 - y1i : ys1 - y1i, xs0 - x1i : xs1 - x1i] >= 0.5
        ).astype(np.uint8)
    return out


def _category_tables(cfg: Config, dataset):
    """(num_stuff, stuff channel -> cat id, det label -> cat id)."""
    if hasattr(dataset, "label_to_thing_cat"):
        stuff_ids = dataset.stuff_cat_ids
        return len(stuff_ids), stuff_ids, dataset.label_to_thing_cat
    num_stuff = cfg.dataset.num_stuff
    thing_ids = {i: num_stuff + i - 1 for i in range(cfg.dataset.num_classes)}
    return num_stuff, list(range(num_stuff)), thing_ids


def _summarize(dataset, all_dets, all_segs, all_pans) -> dict:
    results = {}
    try:
        results["boxes"] = dataset.evaluate_boxes(all_dets)
        results["masks"] = dataset.evaluate_masks(all_dets)
    except NotImplementedError:
        pass
    try:
        results["ssegs"] = dataset.evaluate_ssegs(all_segs)
        results["panoptic"] = dataset.evaluate_panoptic(all_pans)
    except NotImplementedError:
        pass
    return results


def postprocess_image(cfg: Config, dataset, out_i: dict, meta: dict):
    """Device outputs for one image -> detection / seg / panoptic results in
    original-image coordinates."""
    import cv2

    scale = float(meta["scale"])
    oh, ow = (int(x) for x in meta["orig_hw"])
    rh, rw = (int(x) for x in meta["im_hw"])
    image_id = meta["image_id"]

    valid = np.asarray(out_i["det_valid"])
    boxes = np.asarray(out_i["boxes"])[valid] / scale
    boxes[:, 0::2] = boxes[:, 0::2].clip(0, ow - 1)
    boxes[:, 1::2] = boxes[:, 1::2].clip(0, oh - 1)
    scores = np.asarray(out_i["scores"])[valid]
    classes = np.asarray(out_i["classes"])[valid]
    mask_probs = 1.0 / (1.0 + np.exp(-np.asarray(out_i["mask_logits"])[valid]))

    detections = []
    for b, s, c, m in zip(boxes, scores, classes, mask_probs):
        det = {
            "image_id": image_id,
            "category": int(c),
            "score": float(s),
            "bbox": b.tolist(),
        }
        det["segmentation"] = rle_mod.encode(paste_mask_full(m, b, (oh, ow)))
        detections.append(det)

    # semantic prediction: argmax at 1/4 canvas scale -> crop -> orig size
    # (argmax happens on-device when the predict step was built with
    # seg_argmax=True; the full logits only cross for TTA)
    if "seg_pred_q" in out_i:
        seg_pred_q = np.asarray(out_i["seg_pred_q"])
    else:
        seg_pred_q = np.asarray(out_i["seg_logits"]).argmax(-1)
    seg_pred_q = seg_pred_q[: max(rh // 4, 1), : max(rw // 4, 1)]
    seg_pred = cv2.resize(
        seg_pred_q.astype(np.int32), (ow, oh), interpolation=cv2.INTER_NEAREST
    )

    # panoptic: channel map -> segments at original resolution
    pan_q = np.asarray(out_i["pan_map"])[: max(rh // 4, 1), : max(rw // 4, 1)]
    pan_full = cv2.resize(
        pan_q.astype(np.int32), (ow, oh), interpolation=cv2.INTER_NEAREST
    )
    det_classes_all = np.asarray(out_i["classes"])
    det_keep = np.asarray(out_i["pan_keep"])
    num_stuff, stuff_cat_ids, thing_cat_ids = _category_tables(cfg, dataset)
    # area limit applies at original resolution
    id_map, segments = build_panoptic_output(
        pan_full, num_stuff, det_classes_all, det_keep,
        cfg.test.panoptic_stuff_area_limit, stuff_cat_ids, thing_cat_ids,
    )
    return {
        "detections": detections,
        "seg": {"image_id": image_id, "pred": seg_pred},
        "panoptic": {"image_id": image_id, "id_map": id_map, "segments": segments},
    }


def run_evaluation(cfg: Config, dataset, weights=None, logger=None,
                   max_images=None, params=None, output_dir=None,
                   use_mesh: bool = True):
    import jax
    import jax.numpy as jnp

    from upsnet_tpu.models.upsnet import forward_predict

    model = get_model(cfg.symbol, cfg)
    bucket0 = cfg.test.image_buckets[0]
    if params is None:
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1,) + tuple(bucket0) + (3,))
        )["params"]
        if weights:
            from upsnet_tpu.train.checkpoints import restore_checkpoint

            state = restore_checkpoint(weights, {"params": params}, partial=True)
            params = state["params"]

    # multi-device eval: the reference shards the test im_list across GPUs
    # (SURVEY.md §3.2); here images are batched n_dev at a time through a
    # mesh-sharded predict step (same step the multichip dryrun asserts
    # bit-equal with single-device). Single device -> plain per-image jit.
    # TTA stays per-image (its per-scale evidence merge is host-driven).
    use_tta = bool(cfg.test.multi_scale) or cfg.test.flip_test
    mesh = None
    if use_mesh and not use_tta and len(jax.devices()) > 1:
        from upsnet_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(cfg.num_devices)
    n_dev = int(np.prod(mesh.devices.shape)) if mesh is not None else 1

    anchors_by_bucket = {
        tuple(b): tuple(
            jnp.asarray(a)
            for a in pyramid_anchors(tuple(b), scale=cfg.network.anchor_scale,
                                     ratios=cfg.network.anchor_ratios)
        )
        for b in cfg.test.image_buckets
    }
    from upsnet_tpu.parallel.steps import make_predict_step

    predict_by_bucket = {
        b: make_predict_step(model, cfg, anc, mesh, seg_argmax=not use_tta)
        for b, anc in anchors_by_bucket.items()
    }

    all_dets, all_segs, all_pans = [], [], []
    n = len(dataset) if max_images is None else min(max_images, len(dataset))
    # multi-host eval: shard images across processes; each host evaluates
    # its shard (the reference gathers via the filesystem, SURVEY.md §5.8 —
    # callers merge per-host result dicts the same way)
    shard = range(jax.process_index(), n, jax.process_count())
    if use_tta:
        from upsnet_tpu.evaluation.tta import predict_image_tta

        for i in shard:
            r = predict_image_tta(cfg, dataset, i, params, predict_by_bucket)
            oh, ow = r["orig_hw"]
            for b, s_, c, m in zip(
                r["boxes"], r["scores"], r["classes"], r["mask_logits"]
            ):
                mp = 1.0 / (1.0 + np.exp(-m))
                all_dets.append({
                    "image_id": r["image_id"], "category": int(c),
                    "score": float(s_), "bbox": b.tolist(),
                    "segmentation": rle_mod.encode(
                        paste_mask_full(mp, b, (oh, ow))
                    ),
                })
            all_segs.append({"image_id": r["image_id"], "pred": r["seg_pred"]})
            num_stuff, stuff_ids, thing_ids = _category_tables(cfg, dataset)
            id_map, segments = build_panoptic_output(
                r["pan_map"], num_stuff, r["classes"], r["pan_keep"],
                cfg.test.panoptic_stuff_area_limit, stuff_ids, thing_ids,
            )
            all_pans.append({"image_id": r["image_id"], "id_map": id_map,
                             "segments": segments})
            if logger and (i + 1) % 50 == 0:
                logger.info("tta inference %d/%d", i + 1, n)
        _write_artifacts(output_dir, all_pans, logger)
        return _summarize(dataset, all_dets, all_segs, all_pans)

    done = 0
    pending: dict = {}

    def flush(bucket):
        nonlocal done
        group = pending.pop(bucket, [])
        if not group:
            return
        k = len(group)
        # pad the final partial group by repeating the last sample; padded
        # lanes are computed and discarded (static shapes, no recompile)
        padded = group + [group[-1]] * (n_dev - k)
        imgs = np.stack([g["images"] for g in padded])
        if cfg.network.compute_dtype == "bfloat16":
            # bit-identical downstream (stem casts to bf16 anyway,
            # data/wire.py) at half the host->device bytes
            import ml_dtypes

            imgs = imgs.astype(ml_dtypes.bfloat16)
        batch = {
            "images": jnp.asarray(imgs),
            "im_hw": jnp.asarray(np.stack([g["im_hw"] for g in padded])),
        }
        if mesh is not None:
            from upsnet_tpu.parallel.mesh import shard_batch

            batch = shard_batch(mesh, batch)
        out = predict_by_bucket[bucket](params, batch)
        out = jax.tree.map(np.asarray, out)
        for j in range(k):
            out_i = jax.tree.map(lambda x: x[j], out)
            res = postprocess_image(cfg, dataset, out_i, group[j])
            all_dets.extend(res["detections"])
            all_segs.append(res["seg"])
            all_pans.append(res["panoptic"])
        done += k
        if logger and (done // 50) != ((done - k) // 50):
            logger.info("inference %d/%d", done, n)

    for i in shard:
        s = dataset.sample(i)
        bucket = tuple(s["images"].shape[:2])
        pending.setdefault(bucket, []).append(s)
        if len(pending[bucket]) == n_dev:
            flush(bucket)
    for bucket in list(pending):
        flush(bucket)

    _write_artifacts(output_dir, all_pans, logger)
    return _summarize(dataset, all_dets, all_segs, all_pans)


def _write_artifacts(output_dir, all_pans, logger=None):
    """COCO-panoptic PNG + segments JSON under output_dir (the reference's
    evaluate_panoptic output layout, SURVEY.md §3.2/§3.4 step 5)."""
    if not output_dir or not all_pans:
        return
    from upsnet_tpu.evaluation.panoptic_format import write_panoptic_results

    json_path = write_panoptic_results(output_dir, all_pans)
    if logger:
        logger.info("wrote %d panoptic PNGs + %s", len(all_pans), json_path)
