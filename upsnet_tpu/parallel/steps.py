"""Jitted, sharded train / predict steps."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from upsnet_tpu.config.defaults import Config
from upsnet_tpu.data.wire import decode_batch
from upsnet_tpu.models.upsnet import forward_predict, forward_train


def make_train_step(model, cfg: Config, anchors, optimizer, mesh: Mesh | None = None):
    """Returns train_step(params, opt_state, batch, key, step) -> (params,
    opt_state, metrics). When a mesh is given, in/out shardings pin params
    replicated and the batch split on the 'data' axis; XLA inserts the
    gradient all-reduce (the reference's NCCL DDP hook, SURVEY.md §2.6)."""
    import dataclasses

    net = cfg.network
    impl_train = net.dcn_impl_train or net.dcn_impl
    if impl_train != net.dcn_impl and hasattr(model, "dcn_impl"):
        # train-step DCN impl differs from inference (see NetworkConfig.
        # dcn_impl_train): clone the module with the train impl — the
        # param tree is impl-independent, so checkpoints interoperate
        cfg = cfg.replace(
            network=dataclasses.replace(net, dcn_impl=impl_train)
        )
        model = model.clone(dcn_impl=impl_train)

    def step_fn(params, opt_state, batch, key):
        # wire-format batches (bit-packed masks, uint8 labels, bf16
        # images — data/wire.py) decode inside the program: VPU work
        # fused by XLA, not a second host round-trip. Raw batches pass
        # through unchanged.
        batch = decode_batch(batch)

        def loss_fn(p):
            total, losses = forward_train(model, p, cfg, anchors, batch, key)
            return total, losses

        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        metrics = dict(losses, total=total)
        return params, opt_state, metrics

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0, 1))

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(
        step_fn,
        in_shardings=(repl, repl, data, repl),
        out_shardings=(repl, repl, repl),
        donate_argnums=(0, 1),
    )


def make_predict_step(model, cfg: Config, anchors, mesh: Mesh | None = None,
                      seg_argmax: bool = False):
    """seg_argmax: replace the (B, H/4, W/4, C) f32 semantic logits in the
    output with their uint8 argmax, computed on-device. The eval loop only
    ever argmaxes them (evaluation/inference.py postprocess_image), and on
    a remote TPU front-end the logits dominate the device->host fetch
    (~37 MB/image at 133 COCO classes vs 70 KB for the argmax). TTA keeps
    the full logits — its multi-scale evidence merge averages them."""

    def step_fn(params, batch):
        out = forward_predict(model, params, cfg, anchors,
                              decode_batch(batch))
        if seg_argmax:
            out["seg_pred_q"] = jnp.argmax(
                out.pop("seg_logits"), axis=-1).astype(jnp.uint8)
        return out

    if mesh is None:
        return jax.jit(step_fn)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(step_fn, in_shardings=(repl, data), out_shardings=data)


def init_params(model, cfg: Config, image_hw, key):
    """Initialize the parameter pytree by tracing the init path."""
    dummy = jnp.zeros((1, image_hw[0], image_hw[1], 3), jnp.float32)
    variables = jax.eval_shape(
        functools.partial(model.init, key), dummy
    )  # shape-only first, to fail fast on structure errors
    del variables
    return model.init(key, dummy)["params"]
