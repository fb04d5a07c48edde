"""Device mesh construction and multi-host init.

The reference has **no** distributed implementation (SURVEY.md §2.5 — its
"16×H100 data-parallel all-reduce" exists only as a paper claim). The
TPU-native realization: a 2-axis `jax.sharding.Mesh` — `data` for batch
(DP gradients psum over ICI) and `model` for row-sharded embedding tables /
dedicated-parameter stacks. Multi-host slices initialize via
`jax.distributed` and communicate over DCN at the data layer only.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ('data', 'model') mesh. Defaults: all devices on the data axis.

    `data=None` infers data = n_devices // model.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        assert n % model == 0, (n, model)
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def multihost_init(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize jax.distributed for multi-host (DCN) training. No-op when
    already initialized or single-process."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (RuntimeError, ValueError):
        pass  # already initialized or single-process environment
