"""Full-state checkpointing with orbax.

The reference's snapshots are weight-only pickles; Adam moments, the Gs EMA
decay position, pl_mean, the IMLE cursor and staleness are all lost on
resume (SURVEY.md §5 'Checkpoint / resume'). This module checkpoints the
complete TrainState plus the IMLE orchestration scalars so a resumed run is
bit-continuous. The pkl snapshot (training_loop.snapshot_dict) remains the
interchange format for eval/CLIs."""

import os
from typing import Any, Dict, Optional

import jax
import numpy as np

from .optimizer import AdamState
from .train_state import TrainState


def save_checkpoint(ckpt_dir: str, state: TrainState,
                    imle_state: Optional[Dict[str, Any]] = None,
                    step: Optional[int] = None) -> str:
    import orbax.checkpoint as ocp
    step = int(state.step) if step is None else step
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step:08d}")
    ckptr = ocp.StandardCheckpointer()
    payload = {
        "state": _to_plain(state),
        "imle": imle_state or {},
    }
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    return path


def load_checkpoint(path: str, target_state: TrainState):
    """Restore into the structure of ``target_state`` (from
    create_train_state with the same configs). Returns (state, imle_dict)."""
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    # orbax/tensorstore rejects relative paths
    restored = ckptr.restore(os.path.abspath(path))
    return _from_plain(restored["state"], target_state), restored.get("imle", {})


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [d for d in os.listdir(ckpt_dir) if d.startswith("step_")]
    if not steps:
        return None
    return os.path.join(os.path.abspath(ckpt_dir), sorted(steps)[-1])


def _to_plain(state: TrainState) -> Dict[str, Any]:
    return {
        "step": state.step,
        "g_params": state.g_params,
        "d_params": state.d_params,
        "gs_params": state.gs_params,
        "g_opt": state.g_opt._asdict(),
        "d_opt": state.d_opt._asdict(),
        "pl_mean": state.pl_mean,
    }


def _from_plain(d: Dict[str, Any], like: TrainState) -> TrainState:
    return TrainState(
        step=d["step"], g_params=d["g_params"], d_params=d["d_params"],
        gs_params=d["gs_params"],
        g_opt=AdamState(**d["g_opt"]), d_opt=AdamState(**d["d_opt"]),
        pl_mean=d["pl_mean"])
