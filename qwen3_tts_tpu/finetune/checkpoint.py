"""Training-state checkpoint/resume via orbax.

The reference SFT has no optimizer state persistence and no resume
(SURVEY.md §5: per-epoch whole-dir copies only).  This adds fault-tolerant
training: params + optimizer state + step counter saved atomically, resumable
mid-epoch.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple


def _is_step_dir(name: str) -> bool:
    # a COMPLETED step dir is 'step_' + digits only; a save interrupted
    # mid-write leaves an orbax temp dir ('step_XXXX.orbax-checkpoint-tmp-
    # <ts>') that must neither count toward `keep` nor win latest_step
    return name.startswith("step_") and name[len("step_"):].isdigit()


def save_train_state(ckpt_dir: str, step: int, params, opt_state,
                     keep: int = 3) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(ckpt_dir, f"step_{step:08d}"))
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, {"params": params, "opt_state": opt_state,
                          "step": step}, force=True)
    # prune old COMPLETED checkpoints
    entries = sorted(d for d in os.listdir(ckpt_dir) if _is_step_dir(d))
    for stale in entries[:-keep]:
        import shutil

        shutil.rmtree(os.path.join(ckpt_dir, stale), ignore_errors=True)


def latest_step(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    entries = sorted(d for d in os.listdir(ckpt_dir) if _is_step_dir(d))
    if not entries:
        return None
    return int(entries[-1].split("_")[1])


def restore_train_state(ckpt_dir: str, step: Optional[int] = None,
                        template: Optional[Dict[str, Any]] = None
                        ) -> Tuple[Any, Any, int]:
    import orbax.checkpoint as ocp

    if step is None:
        step = latest_step(ckpt_dir)
        if step is None:
            raise FileNotFoundError(f"no train state under {ckpt_dir}")
    path = os.path.abspath(os.path.join(ckpt_dir, f"step_{step:08d}"))
    with ocp.PyTreeCheckpointer() as ckptr:
        if template is not None:
            restored = ckptr.restore(path, item=template)
        else:
            restored = ckptr.restore(path)
    return restored["params"], restored["opt_state"], int(restored["step"])
