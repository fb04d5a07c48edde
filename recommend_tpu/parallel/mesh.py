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
    """Initialize jax.distributed for multi-host (DCN) training.

    Zero-arg (auto-detect) mode tolerates failure — single-process
    environments have nothing to initialize. But when coordinator arguments
    were EXPLICITLY passed, failure re-raises: silently degrading to
    single-process would make the first collective hang or train on 1/N of
    the data with no error at the true fault site."""
    explicit = any(
        a is not None for a in (coordinator_address, num_processes, process_id)
    )
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (RuntimeError, ValueError) as e:
        if "already initialized" in str(e).lower():
            return  # idempotent re-init is fine in both modes
        if explicit:
            raise RuntimeError(
                "jax.distributed.initialize failed with explicit coordinator "
                f"args (coordinator_address={coordinator_address!r}, "
                f"num_processes={num_processes}, process_id={process_id}); "
                "refusing to silently fall back to single-process"
            ) from e
        # zero-arg auto-detect on a single process: nothing to do
