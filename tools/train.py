"""Training CLI.

Reference: ``python upsnet/upsnet_end2end_train.py --cfg <yaml>``
(SURVEY.md §1 L4). Equivalent here:

    python tools/train.py --cfg experiments/upsnet_resnet50_coco.yaml
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", required=True, help="experiment yaml")
    ap.add_argument("--max-steps", type=int, default=None)
    ap.add_argument("--dataset-override", default=None,
                    help="coco | cityscapes | synthetic")
    ap.add_argument("--profile-dir", default=None,
                    help="write a jax.profiler trace of the training loop "
                         "here (view in TensorBoard)")
    args = ap.parse_args()

    from upsnet_tpu.utils.platform import honor_env_platform

    honor_env_platform()

    from upsnet_tpu.config import load_config
    from upsnet_tpu.utils.logging import create_logger

    cfg = load_config(args.cfg)
    out_dir = os.path.join(cfg.output_path, cfg.symbol)
    os.makedirs(out_dir, exist_ok=True)
    shutil.copy(args.cfg, out_dir)  # reference behavior: cfg copied to output
    logger = create_logger(out_dir, cfg.symbol, "train")
    logger.info("config: %s", cfg)

    name = args.dataset_override or cfg.dataset.dataset
    if name == "coco":
        from upsnet_tpu.data.coco import COCOPanoptic

        dataset = COCOPanoptic(cfg, training=True)
    elif name == "cityscapes":
        from upsnet_tpu.data.cityscapes import Cityscapes

        dataset = Cityscapes(cfg, training=True)
    else:
        from upsnet_tpu.data.synthetic import SyntheticDataset

        dataset = SyntheticDataset(cfg, num_images=64, training=True)

    from upsnet_tpu.train.trainer import train
    from upsnet_tpu.utils.profiling import trace

    with trace(args.profile_dir):
        train(cfg, dataset, logger=logger, max_steps=args.max_steps)


if __name__ == "__main__":
    main()
