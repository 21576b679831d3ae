"""Mesh construction: hosts x chips -> a 1-D 'z' row-partition axis.

The reference's distributed model is a 1-D block row partition with z-stacked
domains (generate_matrix.cpp:225-229, README.md:53-63). The TPU equivalent is a
1-D device mesh along 'z'. Device order follows jax.devices(), which for
multi-host TPU slices enumerates host-major — so consecutive z-shards land on
the same host and only slice-boundary halos cross DCN, exactly the layout the
z-stacked decomposition wants.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


Z_AXIS = "z"


def make_mesh(
    n_devices: Optional[int] = None,
    *,
    axis: str = Z_AXIS,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """1-D mesh over the first n_devices devices (all by default)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"requested {n_devices} devices, only {len(devices)} available"
            )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))
