"""Checkpoint / resume — one system for both model families.

Capability parity (SURVEY.md §5.4): params + optimizer state + step counter +
config snapshot + metric history, keep-N rotation, auto-restore-latest on
start (kuaiformer train.py:80-88, 255-265) and named best/final snapshots
(oneTrans train.py:281-313). Built on orbax so checkpoints are sharding-aware
(each host writes its own shards on multi-host meshes).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mngr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(
        self,
        step: int,
        params: Any,
        opt_state: Any,
        config_dict: Optional[Dict] = None,
        history: Optional[Dict] = None,
    ) -> None:
        state = {"params": params, "opt_state": opt_state}
        self._mngr.save(step, args=ocp.args.StandardSave(state))
        if config_dict is not None:
            with open(os.path.join(self.directory, "config.json"), "w") as f:
                json.dump(config_dict, f, indent=2)
        if history is not None:
            with open(os.path.join(self.directory, "history.json"), "w") as f:
                json.dump(history, f, indent=2)

    def latest_step(self) -> Optional[int]:
        return self._mngr.latest_step()

    def restore(
        self, params_like: Any, opt_state_like: Any
    ) -> Optional[Tuple[int, Any, Any]]:
        """Restore the latest checkpoint, or None if none exists. The *_like
        arguments provide the pytree structure/shardings to restore into."""
        step = self._mngr.latest_step()
        if step is None:
            return None
        target = {"params": params_like, "opt_state": opt_state_like}
        restored = self._mngr.restore(
            step, args=ocp.args.StandardRestore(target)
        )
        return step, restored["params"], restored["opt_state"]

    def wait(self):
        self._mngr.wait_until_finished()

    def close(self):
        self._mngr.close()
