"""Device mesh helpers.

The reference's only parallelism is joblib process fan-out of
*independent* fits (src/05_train.py:177-179).  Here a single fit scales
across chips: documents shard over the ``docs`` mesh axis and the
E-step sufficient statistics reduce with ``psum`` over ICI/DCN
(SURVEY.md §2.5).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


DOC_AXIS = "docs"


def make_mesh(n_devices: Optional[int] = None, devices: Optional[Sequence] = None) -> Mesh:
    """1-D document-parallel mesh over the first ``n_devices`` devices.

    Raises if fewer than ``n_devices`` devices exist — silently
    truncating would make an "8-way" mesh a 1-way mesh and void any
    multi-chip validation built on it.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"make_mesh({n_devices}) needs {n_devices} devices but the "
                f"{jax.default_backend()} backend has {len(devices)}; for a "
                "virtual CPU mesh set XLA_FLAGS=--xla_force_host_platform_"
                f"device_count={n_devices} and force jax_platforms=cpu "
                "before first device use"
            )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DOC_AXIS,))


def default_mesh() -> Optional[Mesh]:
    """Mesh over all local devices; None when there is a single device."""
    devs = jax.devices()
    if len(devs) <= 1:
        return None
    return make_mesh(devices=devs)
