"""Checkpoint save/restore via Orbax.

Reference behavior (SURVEY.md §5.4): ``torch.save({state_dict, optimizer,
iteration})`` at snapshot boundaries under ``output/<cfg>/...``; resume
reloads the latest. Here: Orbax StandardCheckpointer over the
{params, opt_state, iteration} pytree with the same latest-snapshot resume
semantics.
"""

from __future__ import annotations

import os

import jax
import orbax.checkpoint as ocp


def save_checkpoint(ckpt_dir: str, step: int, params, opt_state) -> str:
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step:08d}")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, {"params": params, "opt_state": opt_state,
                      "iteration": jax.numpy.asarray(step)})
    ckptr.wait_until_finished()
    return path


def latest_checkpoint(ckpt_dir: str) -> str | None:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = sorted(
        d for d in os.listdir(ckpt_dir) if d.startswith("step_")
    )
    return os.path.join(os.path.abspath(ckpt_dir), steps[-1]) if steps else None


def restore_checkpoint(path: str, template, partial: bool = False):
    """template: pytree of like-shaped arrays (e.g. fresh init).

    partial=True restores a subtree (e.g. only params for inference) from a
    full {params, opt_state, iteration} snapshot.
    """
    path = os.path.abspath(path)
    if partial:
        # template-free read (returns the full saved tree as host arrays);
        # callers slice out the subtree they need (e.g. just params)
        full = ocp.PyTreeCheckpointer().restore(path)
        return full
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, target=template)
