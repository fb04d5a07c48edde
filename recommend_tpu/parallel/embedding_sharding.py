"""Row-sharded embedding lookup — the explicit (shard_map) path.

The TPU-native replacement for the reference's "dedicated sparse-embedding
servers" (kuaiformer translation:214; SURVEY.md §5.8): embedding tables live
row-sharded across the `model` mesh axis; a lookup is
  1. every chip receives the (replicated) id batch,
  2. each chip gathers the rows it owns (out-of-range ids → zero rows),
  3. one `psum` over the model axis assembles full embeddings.

This is exact and differentiable: the VJP of the masked local gather is a
scatter-add into the local shard only, and `psum`'s transpose is the identity
— so gradients land on the owning chip without any extra communication.

Traffic: O(B·D) over ICI per lookup (the psum). A dedup + all-to-all variant
(exchange unique ids, return only owned rows) cuts this to O(unique·D) and is
the natural next optimization; the GSPMD automatic path (partition rules in
`sharding.py`) remains the default for training because XLA fuses the
collectives into the surrounding program.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def shard_table(mesh: Mesh, table: jax.Array, axis: str = "model") -> jax.Array:
    """Place a [V, D] table row-sharded over `axis` (V must divide evenly)."""
    assert table.shape[0] % mesh.shape[axis] == 0, (
        table.shape, mesh.shape[axis]
    )
    return jax.device_put(table, NamedSharding(mesh, P(axis, None)))


def sharded_lookup(
    mesh: Mesh,
    table: jax.Array,  # [V, D] sharded P(axis, None)
    ids: jax.Array,  # any int shape, replicated
    axis: str = "model",
) -> jax.Array:
    """→ embeddings of shape ids.shape + [D]."""
    n = mesh.shape[axis]
    v, d = table.shape
    local_v = v // n
    shape = ids.shape

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis, None), P()),
        out_specs=P(),
        check_vma=False,
    )
    def _lookup(local_table, flat_ids):
        shard = jax.lax.axis_index(axis)
        local = flat_ids - shard * local_v
        in_range = (local >= 0) & (local < local_v)
        safe = jnp.clip(local, 0, local_v - 1)
        rows = jnp.take(local_table, safe, axis=0)
        rows = jnp.where(in_range[:, None], rows, 0)
        return jax.lax.psum(rows, axis)

    flat = ids.reshape(-1)
    out = _lookup(table, flat)
    return out.reshape(shape + (d,))
