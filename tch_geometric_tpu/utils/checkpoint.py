"""Checkpoint / resume (SURVEY §5: absent in the reference; required here).

Orbax-backed checkpointing of the training pytree: model/optimizer state,
the RNG root key, and step counters.  Graph data is immutable input and is
not checkpointed.  Falls back to pickle+numpy when orbax is unavailable.
"""
from __future__ import annotations

import os
import pickle
from typing import Any, Optional

import jax

try:
    import orbax.checkpoint as ocp
    _HAVE_ORBAX = True
except Exception:  # pragma: no cover
    _HAVE_ORBAX = False


def save_checkpoint(path: str, state: Any, *, step: Optional[int] = None,
                    force: bool = True) -> str:
    """Save a pytree (e.g. TrainState + rng key) under ``path``."""
    path = os.path.abspath(path)
    if _HAVE_ORBAX:
        ckptr = ocp.StandardCheckpointer()
        target = os.path.join(path, f"step_{step}") if step is not None else path
        ckptr.save(target, jax.device_get(state), force=force)
        ckptr.wait_until_finished()
        return target
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path + ".pkl", "wb") as f:
        pickle.dump(jax.device_get(state), f)
    return path + ".pkl"


def restore_checkpoint(path: str, template: Any, *, step: Optional[int] = None):
    """Restore a pytree saved by :func:`save_checkpoint`; ``template``
    provides structure/shapes/dtypes."""
    path = os.path.abspath(path)
    if _HAVE_ORBAX:
        ckptr = ocp.StandardCheckpointer()
        target = os.path.join(path, f"step_{step}") if step is not None else path
        return ckptr.restore(target, target=jax.device_get(template))
    with open(path + ".pkl", "rb") as f:
        return pickle.load(f)


def latest_step(path: str) -> Optional[int]:
    """Largest step_* checkpoint under ``path`` (None if none)."""
    if not os.path.isdir(path):
        return None
    steps = [int(d.split("_", 1)[1]) for d in os.listdir(path)
             if d.startswith("step_") and d.split("_", 1)[1].isdigit()]
    return max(steps) if steps else None
