"""Synthesize a "pretrained" checkpoint with FOLDED frozen-BN affines.

The reference's flagship configs (SURVEY.md §2.3) train with frozen BN
whose scale/bias come from ImageNet running stats folded at export time —
`gamma/sqrt(var+eps)` whitens each BN input. No ImageNet checkpoint
exists on this machine, so the frozen-BN training path (the exact
configuration parity runs will use) had never trained end-to-end
(VERDICT r3 Weak #5 / next #7). This tool closes that gap without any
download: it folds DATA-DEPENDENT stats into the FrozenBatchNorm affines
(LSUV-style calibration) so the frozen-BN backbone is trainable from
"pretrained-like" init:

  1. init the flagship model (random conv weights, identity BN affines);
  2. forward a caffe-convention calibration batch (uniform 0-255 BGR
     minus PIXEL_MEANS_BGR — the pipeline's exact normalization) with
     ``capture_intermediates`` filtered to FrozenBatchNorm modules;
  3. for every captured BN output (out = x*s + b), refold the affine so
     the output is whitened under the CURRENT input distribution:
         s' = s / std(out),   b' = (b - mean(out)) / std(out)
  4. repeat — upstream refolds change downstream inputs; ~6 passes
     converge (max |mean| ~ 0, std ~ 1 at every BN);
  5. save {"params": ...} as an orbax snapshot that
     ``network.pretrained`` loads directly (train/trainer.py
     load_pretrained_any).

Usage:
    python tools/make_synth_pretrained.py \
        --cfg experiments/upsnet_r50_synth_frozenbn.yaml \
        --out model/synth_frozenbn_r50
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _to_mutable(tree):
    """Recursive plain-dict copy (init may hand back FrozenDicts)."""
    if hasattr(tree, "items"):
        return {k: _to_mutable(v) for k, v in tree.items()}
    return tree


def _fold_once(model, params, x, FrozenBatchNorm):
    """One calibration pass; returns (new params, worst |mean|, worst
    |std - 1|) across all FrozenBN outputs."""
    import jax
    import jax.numpy as jnp

    _, state = model.apply(
        {"params": params}, x,
        capture_intermediates=lambda mdl, _: isinstance(mdl, FrozenBatchNorm),
    )
    flat = jax.tree_util.tree_flatten_with_path(
        state["intermediates"], is_leaf=lambda v: isinstance(v, tuple)
    )[0]
    worst_mu, worst_sd = 0.0, 0.0
    new = _to_mutable(params)
    for path, captured in flat:
        keys = [str(getattr(p, "key", p)) for p in path]
        if keys[-1] != "__call__":
            continue
        out = captured[0] if isinstance(captured, tuple) else captured
        mod_path = keys[:-1]
        node = new
        for k in mod_path[:-1]:
            node = node[k]
        leaf = node[mod_path[-1]]
        s, b = leaf["scale"], leaf["bias"]
        axes = tuple(range(out.ndim - 1))
        mu = jnp.mean(out.astype(jnp.float32), axis=axes)
        sd = jnp.std(out.astype(jnp.float32), axis=axes)
        # Refold only channels with healthy variance: a dead channel
        # (constant under the calibration batch, sd ~ 0 — upstream ReLU
        # kills some channels at random init) must keep its affine, or
        # the 1/sd refold amplifies numerical noise by ~1e4 and the next
        # pass cascades to inf (the r4 divergence at pass 3). Dead
        # channels also don't gate convergence — they carry no signal.
        live = sd > 5e-2
        sd_safe = jnp.where(live, sd, 1.0)
        leaf["scale"] = jnp.where(live, s / sd_safe, s).astype(s.dtype)
        leaf["bias"] = jnp.where(
            live, (b - mu) / sd_safe, b).astype(b.dtype)
        worst_mu = max(worst_mu, float(jnp.max(jnp.abs(
            jnp.where(live, mu, 0.0)))))
        worst_sd = max(worst_sd, float(jnp.max(jnp.abs(
            jnp.where(live, sd, 1.0) - 1.0))))
    return new, worst_mu, worst_sd


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", required=True,
                    help="experiment yaml with network.norm=frozen_bn")
    ap.add_argument("--out", required=True, help="output snapshot dir")
    ap.add_argument("--passes", type=int, default=6)
    ap.add_argument("--calib-hw", type=int, nargs=2, default=(256, 320),
                    help="calibration input size (stats are per-channel, "
                         "resolution matters little)")
    args = ap.parse_args()

    from upsnet_tpu.utils.platform import honor_env_platform

    honor_env_platform()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from upsnet_tpu.config import load_config
    from upsnet_tpu.data.transforms import PIXEL_MEANS_BGR
    from upsnet_tpu.models.layers import FrozenBatchNorm
    from upsnet_tpu.models.registry import get_model
    from upsnet_tpu.train.checkpoints import save_checkpoint

    cfg = load_config(args.cfg)
    if cfg.network.norm != "frozen_bn":
        raise SystemExit(
            f"{args.cfg}: network.norm={cfg.network.norm!r} — folding "
            "only applies to frozen_bn")
    model = get_model(cfg.symbol, cfg)
    h, w = args.calib_hw
    params = model.init(
        jax.random.PRNGKey(cfg.seed), jnp.zeros((1, h, w, 3))
    )["params"]
    params = jax.tree.map(np.asarray, params)

    # caffe-convention calibration batch: uniform 0-255 BGR minus means
    rng = np.random.RandomState(cfg.seed)
    x = jnp.asarray(
        rng.uniform(0.0, 255.0, (4, h, w, 3)).astype(np.float32)
        - PIXEL_MEANS_BGR
    )

    for i in range(args.passes):
        params, worst_mu, worst_sd = _fold_once(
            model, params, x, FrozenBatchNorm)
        print(f"pass {i + 1}: worst BN-out |mean| = {worst_mu:.4f}, "
              f"worst |std-1| = {worst_sd:.4f}", flush=True)

    if worst_mu > 0.1 or worst_sd > 0.1:
        raise SystemExit("calibration did not converge — raise --passes")
    path = save_checkpoint(os.path.abspath(args.out), 0, params, {})
    print(f"saved folded frozen-BN init: {path}")


if __name__ == "__main__":
    main()
