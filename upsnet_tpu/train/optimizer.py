"""Optimizer + LR schedule.

Reference (SURVEY.md §3.1): SGD momentum 0.9, weight decay 1e-4, per-param
rules (bias: 2x LR and no weight decay — Detectron convention), linear
warmup (~500 iters, factor 1/3) then multi-step decay; conv1 + res2 frozen.

Built with optax: multi_transform over a param-label tree implements the
freezing and the bias rules; the schedule is a standard
warmup + piecewise-constant.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import optax

from upsnet_tpu.config.defaults import Config


def lr_schedule(cfg: Config) -> optax.Schedule:
    tc = cfg.train
    boundaries = {int(it): cfg.train.decay_factor for it in tc.decay_iteration}

    def sched(step):
        warm = tc.warmup_factor + (1.0 - tc.warmup_factor) * jnp.minimum(
            step / max(tc.warmup_iteration, 1), 1.0
        )
        decay = jnp.asarray(1.0)
        for b in boundaries:
            decay = decay * jnp.where(step >= b, boundaries[b], 1.0)
        return tc.lr * warm * decay

    return sched


def _param_labels(params, frozen_stages: Sequence[int],
                  freeze_norm: bool = True) -> dict:
    """Label tree: 'frozen' | 'bias' | 'weight'.

    Frozen: backbone conv1/bn1 and res2 blocks (reference freezes conv1+res2)
    plus every FrozenBatchNorm affine (also stop_gradient'ed in-module).
    Bias params get 2x LR and no weight decay.
    """
    frozen_prefixes = []
    if 1 in frozen_stages:
        frozen_prefixes += ["backbone_net/conv1", "backbone_net/bn1"]
    if 2 in frozen_stages:
        frozen_prefixes += ["backbone_net/res2_"]

    def label(path, leaf):
        p = "/".join(str(k.key) for k in path)
        if any(p.startswith(fp) for fp in frozen_prefixes):
            return "frozen"
        if "offset_conv" in p:
            # DCN offset predictors: own group so train.dcn_offset_lr_mult
            # can damp them (from-scratch offset-runaway recipe, VERDICT
            # r3 #1a). The bias keeps the damped LR (NOT the Detectron 2x
            # — that would amplify the exact runaway the multiplier damps)
            # but, like every other bias, takes no weight decay (ADVICE
            # r4: decaying the offset bias was a deviation from the
            # reference bias rule with no restoring-force rationale —
            # the zero-offset prior lives in the weights).
            if p.endswith("/bias"):
                return "offset_bias"
            return "offset"
        if freeze_norm and (
            "bn" in p.split("/")[-2:-1] or p.endswith("/scale")
        ):
            return "frozen"  # FrozenBatchNorm affines never train
        if not freeze_norm and p.endswith("/scale"):
            return "bias"  # GN affines: no weight decay (common practice)
        if p.endswith("/bias"):
            return "bias"
        return "weight"

    import jax

    return jax.tree_util.tree_map_with_path(label, params)


def make_optimizer(cfg: Config, params) -> optax.GradientTransformation:
    sched = lr_schedule(cfg)
    tc = cfg.train

    def sgd(lr_mult: float, wd: float):
        return optax.chain(
            optax.add_decayed_weights(wd) if wd else optax.identity(),
            optax.sgd(
                lambda s: sched(s) * lr_mult,
                momentum=tc.momentum,
                nesterov=False,
            ),
        )

    labels = _param_labels(
        params, cfg.network.frozen_stages,
        freeze_norm=cfg.network.norm == "frozen_bn",
    )
    tx = optax.multi_transform(
        {
            "weight": sgd(1.0, tc.wd),
            "bias": sgd(2.0, 0.0),
            # offset conv weights keep weight decay (the restoring force
            # toward zero-offset) at a configurable LR; the offset bias
            # follows the no-decay bias rule at the same damped LR
            "offset": sgd(tc.dcn_offset_lr_mult, tc.wd),
            "offset_bias": sgd(tc.dcn_offset_lr_mult, 0.0),
            "frozen": optax.set_to_zero(),
        },
        labels,
    )
    if tc.grad_clip > 0:
        tx = optax.chain(optax.clip_by_global_norm(tc.grad_clip), tx)
    return tx
