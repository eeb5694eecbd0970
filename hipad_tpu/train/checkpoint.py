"""Orbax checkpointing (reference: mmcv CheckpointHook keeping 1 ckpt per
epoch-equivalent, `hipad_b2d_stage2.py:13`, + ``runner.resume``)."""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


def save_checkpoint(ckpt_dir: str, step: int, state: Any, keep: int = 1):
    import orbax.checkpoint as ocp

    ckpt_dir = os.path.abspath(ckpt_dir)
    os.makedirs(ckpt_dir, exist_ok=True)
    with ocp.CheckpointManager(
        ckpt_dir, options=ocp.CheckpointManagerOptions(max_to_keep=keep)
    ) as mgr:
        # tx (the optax transform) is static; strip it for serialization.
        payload = {
            "step": state.step,
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
        }
        mgr.save(step, args=ocp.args.StandardSave(payload))
        mgr.wait_until_finished()


def restore_checkpoint(ckpt_dir: str, state: Any, step: Optional[int] = None):
    """Restores into the same structure as ``state`` (tx preserved)."""
    import orbax.checkpoint as ocp

    ckpt_dir = os.path.abspath(ckpt_dir)
    with ocp.CheckpointManager(ckpt_dir) as mgr:
        step = step if step is not None else mgr.latest_step()
        template = {
            "step": state.step,
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
        }
        payload = mgr.restore(step, args=ocp.args.StandardRestore(template))
    return state.replace(**payload)


def load_variables(ckpt_dir: str, step: Optional[int] = None) -> dict:
    """Restore ``{"params", "batch_stats"}`` for inference-only consumers
    (serving sweep, eval/agent tools) without building a train state."""
    import orbax.checkpoint as ocp

    ckpt_dir = os.path.abspath(ckpt_dir)
    with ocp.CheckpointManager(ckpt_dir) as mgr:
        step = step if step is not None else mgr.latest_step()
        payload = mgr.restore(step)
    return {"params": payload["params"], "batch_stats": payload["batch_stats"]}


def load_params_only(ckpt_dir: str, state: Any, step: Optional[int] = None):
    """Stage-2 warm start from a stage-1 checkpoint (`config:672`): restore
    params/batch_stats, keep fresh optimizer state."""
    restored = restore_checkpoint(ckpt_dir, state, step)
    return state.replace(params=restored.params, batch_stats=restored.batch_stats)
