"""Partition rules: parameters and batches → NamedShardings.

Strategy (SURVEY.md §5.8, BASELINE.json north star):
  - embedding tables (any `nn.Embed` leaf named ``embedding``) whose vocab
    exceeds a threshold → **row-sharded** over the ``model`` axis
    (PartitionSpec('model', None)) — the TPU-native replacement for the
    reference's "dedicated sparse-embedding servers" (kuaiformer
    translation:214). Lookups compile to XLA gather + collectives under
    GSPMD; the hand-optimized all-to-all path lives in
    ``embedding_sharding.py``.
  - dedicated NS-token parameter stacks ([n_ns, d, ...]) → sharded over
    ``model`` on the stack axis when the axis divides evenly.
  - everything else replicated (data-parallel).
  - batches → sharded on the leading (batch) dim over ``data``.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# row-shard only tables at least this many rows (small tables stay replicated)
ROW_SHARD_MIN_VOCAB = 16_384

# dedicated NS stacks worth sharding over 'model' (leaf names from MixedBlock)
_NS_STACK_NAMES = {
    "q_ns", "k_ns", "v_ns", "ffn_ns_in", "ffn_ns_out", "ffn_ns_in_b", "ffn_ns_out_b",
}


def _path_keys(path) -> list:
    return [getattr(p, "key", getattr(p, "name", str(p))) for p in path]


def param_spec(path, leaf, model_axis_size: int) -> P:
    keys = _path_keys(path)
    if keys and keys[-1] == "embedding" and leaf.ndim == 2:
        if leaf.shape[0] >= ROW_SHARD_MIN_VOCAB and model_axis_size > 1:
            return P("model", None)
        return P()
    if (
        model_axis_size > 1
        and keys
        and keys[-1] in _NS_STACK_NAMES
        and leaf.shape[0] % model_axis_size == 0
    ):
        return P("model")
    return P()


def param_shardings(mesh: Mesh, params: Any) -> Any:
    m = mesh.shape.get("model", 1)
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, param_spec(path, leaf, m)), params
    )


def shard_params(mesh: Mesh, params: Any) -> Any:
    return jax.device_put(params, param_shardings(mesh, params))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Shard every leaf's leading dim over the data axis."""
    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def accum_sharding(mesh: Mesh, accum) -> NamedSharding:
    """Sharding for a sparse-optimizer accumulator so it lives WITH its
    table's rows: [V] (rowwise mode) → P('model'); [V, D] (exact mode) →
    P('model', None); small tables replicated — mirroring `param_spec`'s
    row-sharding rule so the touched-row update never moves accumulator
    rows across chips."""
    m = mesh.shape.get("model", 1)
    if m > 1 and accum.shape[0] >= ROW_SHARD_MIN_VOCAB:
        spec = P("model") if accum.ndim == 1 else P("model", None)
        return NamedSharding(mesh, spec)
    return NamedSharding(mesh, P())


def shard_accums(mesh: Mesh, accums: Any) -> Any:
    return jax.tree_util.tree_map(
        lambda a: jax.device_put(a, accum_sharding(mesh, a)), accums
    )
