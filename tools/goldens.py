"""Golden-tensor parity harness (SURVEY.md §4, §7.2 M0).

Dumps per-stage intermediates for one image so outputs can be diffed
bit-close against the reference implementation (or between revisions of
this framework):

    python tools/goldens.py dump --cfg <yaml> [--weights ckpt | --pth x.pth] \
        [--image path.jpg | --synthetic 0] --out goldens.npz
    python tools/goldens.py compare a.npz b.npz [--atol 1e-3]

Keys dumped: backbone C2..C5, FPN P2..P6, RPN cls/bbox per level,
proposals, detections (boxes/scores/classes), mask logits, semantic
logits, panoptic channel map.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def dump(args):
    from upsnet_tpu.utils.platform import honor_env_platform

    honor_env_platform()
    import jax
    import jax.numpy as jnp

    from upsnet_tpu.config import load_config
    from upsnet_tpu.models.registry import get_model
    from upsnet_tpu.models.upsnet import forward_predict
    from upsnet_tpu.ops.anchors import pyramid_anchors

    cfg = load_config(args.cfg)
    model = get_model(cfg.symbol, cfg)
    bucket = tuple(cfg.test.image_buckets[0])
    params = model.init(
        jax.random.PRNGKey(cfg.seed), jnp.zeros((1,) + bucket + (3,))
    )["params"]
    if args.weights:
        from upsnet_tpu.train.checkpoints import restore_checkpoint

        params = restore_checkpoint(args.weights, None, partial=True)["params"]
    elif args.pth:
        # one-command parity vs a released UPSNet .pth: strict conversion
        # (fails loudly on any unmapped key) then dump (VERDICT r1 #1)
        from upsnet_tpu.convert.torch_converter import load_pretrained

        params = load_pretrained(args.pth, params)

    if args.image:
        import cv2

        from upsnet_tpu.data import transforms as T

        img = cv2.imread(args.image, cv2.IMREAD_COLOR).astype(np.float32)
        scale = T.compute_resize_scale(
            img.shape[0], img.shape[1], cfg.test.scales[0], cfg.test.max_size
        )
        img = T.normalize_bgr(T.resize_image(img, scale))
        rh, rw = img.shape[:2]
        canvas = T.pad_to_bucket(img, bucket)
    else:
        from upsnet_tpu.data.synthetic import SyntheticDataset

        ds = SyntheticDataset(cfg, num_images=8, training=False)
        s = ds.sample(int(args.synthetic))
        canvas, (rh, rw) = s["images"], s["im_hw"]

    images = jnp.asarray(canvas)[None]
    im_hw = jnp.asarray([[float(rh), float(rw)]])
    anchors = tuple(jnp.asarray(a) for a in pyramid_anchors(bucket))

    out = {}
    cs = model.apply({"params": params}, images,
                     method=lambda m, x: m.backbone_net(x))
    for i, c in enumerate(cs, start=2):
        out[f"C{i}"] = np.asarray(c[0])
    pyr = model.apply({"params": params}, cs, method=lambda m, c: m.fpn(c))
    for i, p in enumerate(pyr, start=2):
        out[f"P{i}"] = np.asarray(p[0])
    rpn_cls, rpn_bbox = model.apply({"params": params}, pyr,
                                    method=lambda m, p: m.rpn(p))
    for i, (c, b) in enumerate(zip(rpn_cls, rpn_bbox), start=2):
        out[f"rpn_cls_P{i}"] = np.asarray(c[0])
        out[f"rpn_bbox_P{i}"] = np.asarray(b[0])
    pred = forward_predict(model, params, cfg, anchors,
                           {"images": images, "im_hw": im_hw})
    for k in ("boxes", "scores", "classes", "det_valid", "mask_logits",
              "seg_logits", "pan_map", "pan_keep"):
        out[k] = np.asarray(pred[k][0])
    np.savez_compressed(args.out, **out)
    print(f"wrote {len(out)} tensors to {args.out}")


def compare(args):
    a = np.load(args.a)
    b = np.load(args.b)
    keys = sorted(set(a.files) & set(b.files))
    missing = sorted(set(a.files) ^ set(b.files))
    worst = 0.0
    for k in keys:
        x, y = a[k].astype(np.float64), b[k].astype(np.float64)
        if x.shape != y.shape:
            print(f"{k}: SHAPE MISMATCH {x.shape} vs {y.shape}")
            worst = np.inf
            continue
        d = np.abs(x - y).max() if x.size else 0.0
        rel = d / max(np.abs(y).max(), 1e-12)
        status = "OK" if d <= args.atol else "DIFF"
        print(f"{k}: max_abs={d:.3e} max_rel={rel:.3e} {status}")
        worst = max(worst, d)
    if missing:
        print("only in one file:", missing)
    print("worst:", worst)
    return 0 if worst <= args.atol and not missing else 1


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    d = sub.add_parser("dump")
    d.add_argument("--cfg", required=True)
    d.add_argument("--weights", default=None, help="orbax checkpoint dir")
    d.add_argument("--pth", default=None,
                   help="released UPSNet .pth (strict conversion, then dump)")
    d.add_argument("--image", default=None)
    d.add_argument("--synthetic", default=0)
    d.add_argument("--out", required=True)
    c = sub.add_parser("compare")
    c.add_argument("a")
    c.add_argument("b")
    c.add_argument("--atol", type=float, default=1e-3)
    args = ap.parse_args()
    if args.cmd == "dump":
        dump(args)
    else:
        sys.exit(compare(args))


if __name__ == "__main__":
    main()
