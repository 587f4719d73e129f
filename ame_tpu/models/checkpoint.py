"""Training checkpoint/resume (orbax) — the trainer-side half of the
framework's checkpoint story (SURVEY.md §5.4; serving jobs and fleet
manifests have their own persistence in serve/ and parallel/fleet.py).

A checkpoint is one pytree {"params", "opt_state", "epoch"}; sharded
arrays save/restore with their shardings (orbax handles multi-host).
"""

from __future__ import annotations

import os


def _manager(ckpt_dir: str, keep: int = 3):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        os.path.abspath(ckpt_dir),
        options=ocp.CheckpointManagerOptions(max_to_keep=keep))


def save_train_state(ckpt_dir: str, step: int, params, opt_state) -> None:
    """Write checkpoint ``step`` (blocking — the trainer's epoch cadence
    doesn't need async saves). The pytrees are handed to orbax as-is:
    global-sharded jax.Arrays save with their shardings (every process of
    a multi-host job calls this; orbax coordinates the write)."""
    import orbax.checkpoint as ocp

    mngr = _manager(ckpt_dir)
    tree = {"params": params, "opt_state": opt_state, "epoch": step}
    mngr.save(step, args=ocp.args.StandardSave(tree))
    mngr.wait_until_finished()


def restore_train_state(ckpt_dir: str, params, opt_state):
    """(params, opt_state, next_epoch) from the newest checkpoint, or the
    given state and epoch 0 when none exists. ``params``/``opt_state``
    provide the pytree structure AND target shardings (fresh init
    values — restored arrays land with the same placement)."""
    import orbax.checkpoint as ocp

    if not os.path.isdir(ckpt_dir):
        return params, opt_state, 0
    mngr = _manager(ckpt_dir)
    step = mngr.latest_step()
    if step is None:
        return params, opt_state, 0
    tree = {"params": params, "opt_state": opt_state, "epoch": step}
    out = mngr.restore(step, args=ocp.args.StandardRestore(tree))
    return out["params"], out["opt_state"], int(out["epoch"]) + 1
