"""Resumable EM state checkpointing.

The reference only saves final artifacts (save_model,
src/modules/stm.py:1120-1149) with no resume path (SURVEY.md §5).
Here the full EM state (STMState pytree + bound history + iteration
counter) round-trips through a single .npz, so a pod-scale fit can be
killed and resumed mid-run.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from strutopy_tpu.models.state import STMState


def save_checkpoint(path: str, state: STMState, bounds, em_iter: int, config_json: Optional[str] = None) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    arrays = {f: np.asarray(getattr(state, f)) for f in state._fields}
    tmp = path + ".tmp.npz"
    with open(tmp, "wb") as f:
        np.savez(
            f,
            __bounds=np.asarray(bounds, np.float64),
            __em_iter=np.asarray(em_iter),
            __config=np.frombuffer((config_json or "").encode(), dtype=np.uint8),
            **arrays,
        )
    os.replace(tmp, path)


def load_checkpoint(path: str) -> Tuple[STMState, list, int, Optional[str]]:
    with np.load(path, allow_pickle=False) as z:
        fields = {}
        for f in STMState._fields:
            if f in z:
                fields[f] = jnp.asarray(z[f])
        # compatibility shim for checkpoints written before a field
        # existed (currently: opt_iters).  NOTE: any future STMState
        # field needs its own default here, or old checkpoints fail.
        if "opt_iters" not in fields and "eta" in fields:
            fields["opt_iters"] = jnp.zeros(fields["eta"].shape[0], jnp.int32)
        if "straggler_overflow" not in fields:
            fields["straggler_overflow"] = jnp.zeros((), jnp.int32)
        missing = [f for f in STMState._fields if f not in fields]
        if missing:
            raise ValueError(
                f"checkpoint {path} lacks state fields {missing} and no "
                "compatibility default is defined for them"
            )
        state = STMState(**fields)
        bounds = list(z["__bounds"])
        em_iter = int(z["__em_iter"])
        cfg = bytes(z["__config"]).decode() or None
    return state, bounds, em_iter, cfg
