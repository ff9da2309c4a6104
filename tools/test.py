"""Inference + evaluation CLI.

Reference: ``python upsnet/upsnet_end2end_test.py --cfg <yaml>``
(SURVEY.md §3.2): run the eval branch over the test split, then
evaluate_boxes / evaluate_masks / evaluate_ssegs / evaluate_panoptic.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", required=True)
    ap.add_argument("--weights", "--weight_path", default=None,
                    help="orbax checkpoint path (--weight_path is the "
                         "reference CLI's spelling)")
    ap.add_argument("--dataset-override", default=None)
    ap.add_argument("--max-images", type=int, default=None)
    ap.add_argument("--no-artifacts", action="store_true",
                    help="skip writing panoptic PNG/JSON artifacts")
    ap.add_argument("--no-mesh", action="store_true",
                    help="force single-device per-image eval (default "
                         "batches images over the device mesh)")
    ap.add_argument("--dcn-impl", default=None,
                    help="override network.dcn_impl for this eval (e.g. "
                         "'pallas' to measure the train-time window-"
                         "clipped path vs the exact 'auto' routing)")
    args = ap.parse_args()

    from upsnet_tpu.utils.platform import honor_env_platform

    honor_env_platform()

    from upsnet_tpu.config import load_config
    from upsnet_tpu.evaluation.inference import run_evaluation
    from upsnet_tpu.utils.logging import create_logger

    cfg = load_config(args.cfg)
    if args.dcn_impl:
        import dataclasses

        cfg = cfg.replace(network=dataclasses.replace(
            cfg.network, dcn_impl=args.dcn_impl))
    out_dir = os.path.join(cfg.output_path, cfg.symbol)
    os.makedirs(out_dir, exist_ok=True)
    logger = create_logger(out_dir, cfg.symbol, "test")

    name = args.dataset_override or cfg.dataset.dataset
    if name == "coco":
        from upsnet_tpu.data.coco import COCOPanoptic

        dataset = COCOPanoptic(cfg, training=False)
    elif name == "cityscapes":
        from upsnet_tpu.data.cityscapes import Cityscapes

        dataset = Cityscapes(cfg, training=False)
    else:
        from upsnet_tpu.data.synthetic import SyntheticDataset

        dataset = SyntheticDataset(cfg, num_images=8, training=False)

    results = run_evaluation(
        cfg, dataset, weights=args.weights, logger=logger,
        max_images=args.max_images,
        output_dir=None if args.no_artifacts else os.path.join(
            out_dir, "panoptic"),
        use_mesh=not args.no_mesh,
    )
    from upsnet_tpu.evaluation.coco_eval import format_table

    for k, v in results.items():
        logger.info("%s: %s", k, v)
        if k in ("boxes", "masks") and "APs" in v:
            # the reference prints the full pycocotools 12-metric table
            logger.info("%s COCOeval table:\n%s", k,
                        format_table(v, cfg.test.max_det))


if __name__ == "__main__":
    main()
