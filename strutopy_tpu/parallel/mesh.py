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
    """1-D document-parallel mesh over the first ``n_devices`` devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DOC_AXIS,))


def default_mesh() -> Optional[Mesh]:
    """Mesh over all local devices; None when there is a single device."""
    devs = jax.devices()
    if len(devs) <= 1:
        return None
    return make_mesh(devices=devs)
