"""Device-mesh construction helpers."""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def lp_mesh(dp: Optional[int] = None, tp: Optional[int] = None, devices=None) -> Mesh:
    """A ('dp', 'tp') mesh over the available devices.

    dp shards independent LPs (batch), tp shards LP columns (the wide axis
    of A).  With only one factor given, the other takes all remaining
    devices; with neither, everything goes to dp.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None and tp is None:
        dp, tp = n, 1
    elif dp is None:
        assert n % tp == 0, (n, tp)
        dp = n // tp
    elif tp is None:
        assert n % dp == 0, (n, dp)
        tp = n // dp
    assert dp * tp == n, f"mesh {dp}x{tp} != {n} devices"
    arr = np.array(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))
