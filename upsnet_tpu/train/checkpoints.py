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


class CheckpointMismatch(ValueError):
    """Raised at restore time when the on-disk tree does not match the
    caller's template — with the named key diff, instead of letting the
    mismatch surface later as an opaque tree-structure error inside
    ``model.apply``."""


def _leaf_paths(tree) -> dict:
    """{'a/b/c': shape_or_None} for every leaf in a pytree."""
    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path
        )
        out[key] = getattr(leaf, "shape", None)
    return out


def _diff_against_template(got, template) -> list[str]:
    """Named differences of `got` vs `template` (missing / unexpected /
    shape-mismatched leaves), empty when the trees agree."""
    got_p, tpl_p = _leaf_paths(got), _leaf_paths(template)
    problems = [f"missing from checkpoint: {k} {tpl_p[k]}"
                for k in sorted(tpl_p.keys() - got_p.keys())]
    problems += [f"unexpected in checkpoint: {k} {got_p[k]}"
                 for k in sorted(got_p.keys() - tpl_p.keys())]
    problems += [
        f"shape mismatch at {k}: checkpoint {got_p[k]} vs template {tpl_p[k]}"
        for k in sorted(got_p.keys() & tpl_p.keys())
        if got_p[k] is not None and tpl_p[k] is not None
        and tuple(got_p[k]) != tuple(tpl_p[k])
    ]
    return problems


def restore_checkpoint(path: str, template, partial: bool = False):
    """template: pytree of like-shaped arrays (e.g. fresh init).

    partial=True restores a subtree (e.g. only params for inference) from a
    full {params, opt_state, iteration} snapshot: the saved tree is read
    template-free, then every subtree present in `template` (when one is
    given) is validated leaf-by-leaf — a config/checkpoint mismatch fails
    HERE with a named key diff (CheckpointMismatch), not later inside
    ``model.apply``. Pass template=None to skip validation (raw read).
    """
    path = os.path.abspath(path)
    if partial:
        # Template-free read as HOST NUMPY arrays; callers slice out the
        # subtree they need (e.g. just params) and device_put on use.
        # Explicit restore_type=np.ndarray matters: a bare restore() on a
        # non-CPU backend tries to build jax.Arrays from the snapshot's
        # saved shardings, and a snapshot written on a different platform
        # (the CPU-built synth-pretrained init, a converted .pth) carries
        # none -> "sharding ... Got None" (r5 frozen-BN run).
        import numpy as np

        ckptr = ocp.PyTreeCheckpointer()
        meta_tree = ckptr.metadata(path).item_metadata.tree
        full = ckptr.restore(
            path,
            restore_args=jax.tree.map(
                lambda _: ocp.RestoreArgs(restore_type=np.ndarray), meta_tree
            ),
        )
        if template is not None:
            problems = []
            for key, sub in template.items():
                if key not in full:
                    problems.append(f"missing from checkpoint: {key}")
                else:
                    problems += [f"[{key}] {p}"
                                 for p in _diff_against_template(full[key], sub)]
            if problems:
                head = problems[:20]
                more = len(problems) - len(head)
                raise CheckpointMismatch(
                    f"checkpoint {path} does not match the model/config "
                    f"template ({len(problems)} differences):\n  "
                    + "\n  ".join(head)
                    + (f"\n  ... and {more} more" if more else "")
                )
        return full
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, target=template)
