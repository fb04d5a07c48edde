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

Traffic: O(B·D) over ICI per lookup (the psum). `sharded_lookup_a2a` below is
the dedup + all-to-all variant (exchange unique ids, return only owned rows)
that cuts this to O(unique·D) — the production embedding-server wire protocol
(SURVEY.md §5.8: "lookup = dedup ids → all-to-all → local gather → all-to-all
back; backward = scatter-add into local shards"). `sharded_lookup_column`
covers the column split of the north star's "row/column-sharded" tables. The
GSPMD automatic path (partition rules in `sharding.py`) remains the default
for training because XLA fuses the collectives into the surrounding program.
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


def sharded_lookup_a2a(
    mesh: Mesh,
    table: jax.Array,  # [V, D] sharded P(axis, None)
    ids: jax.Array,  # [B] int, sharded P(axis) (batch-sharded)
    axis: str = "model",
    capacity: int = 0,
) -> jax.Array:
    """Dedup + all-to-all sharded lookup → [B, D] sharded P(axis).

    The TPU realization of the reference's embedding-server protocol
    (kuaiformer translation:214; SURVEY.md §5.8). Per chip, for its local
    batch slice of b ids:
      1. sort + dedup the local ids (duplicates — popular items — are fetched
         once; recsys batches are heavily duplicated),
      2. bucket the unique ids by owning shard into a static [n, capacity]
         request buffer,
      3. `all_to_all` the id requests; each owner gathers its local rows
         (out-of-range / padding ids → zero rows),
      4. `all_to_all` the rows back and scatter them to the original
         positions.
    The backward pass needs no extra code: the VJP of the masked local gather
    is a scatter-add into the owning chip's shard, and `all_to_all`'s
    transpose is the reverse `all_to_all` — gradients land on the owner, the
    SURVEY-specified semantics, by construction.

    ``capacity`` is the static per-owner request budget. 0 ⇒ b (exact for any
    id distribution: a chip can never request more than its b unique ids from
    one owner). Smaller values cut ICI traffic to O(n·capacity·D) per chip —
    with well-hashed ids capacity ≈ ceil(unique/n)+slack suffices; requests
    past the budget are dropped and resolve to zero rows, so choose exactness
    vs bandwidth per table. ids == V (padding) also resolve to zero rows.
    """
    n = mesh.shape[axis]
    v, d = table.shape
    local_v = v // n
    b = ids.shape[0] // n  # per-chip batch slice
    cap = capacity if capacity > 0 else b
    idt = ids.dtype

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )
    def _lookup(local_table, local_ids):
        shard = jax.lax.axis_index(axis)
        # negative ids are invalid like ids >= v: fold them into the v
        # sentinel up front so they sort to the tail with the other invalids
        # (a raw -1 would otherwise wrap into request row n-1 and clobber a
        # legitimate slot)
        local_ids = jnp.where(local_ids < 0, v, local_ids)
        # 1. sort + dedup
        order = jnp.argsort(local_ids)
        sids = jnp.take(local_ids, order)
        first = jnp.concatenate([jnp.ones((1,), bool), sids[1:] != sids[:-1]])
        uslot = (jnp.cumsum(first) - 1).astype(jnp.int32)  # sorted pos → slot
        uids = jnp.full((b,), v, dtype=idt).at[uslot].set(
            sids, mode="drop"
        )  # compacted unique ids, ascending; tail slots stay == v (invalid)
        pos2slot = jnp.zeros((b,), jnp.int32).at[order].set(uslot)
        # 2. bucket unique ids by owner (uids ascending ⇒ owners grouped)
        owner = jnp.where(uids >= v, n, uids // local_v).astype(jnp.int32)
        start = jnp.searchsorted(owner, jnp.arange(n, dtype=owner.dtype))
        within = jnp.arange(b, dtype=jnp.int32) - jnp.take(
            start, jnp.clip(owner, 0, n - 1)
        ).astype(jnp.int32)
        ok = (owner < n) & (within < cap)  # overflow/invalid → zero row
        req = jnp.full((n, cap), v, dtype=idt).at[owner, within].set(
            uids, mode="drop"  # drops owner == n (invalid) and within >= cap
        )
        # 3. exchange requests; serve from the local shard
        peer_req = jax.lax.all_to_all(
            req, axis, split_axis=0, concat_axis=0, tiled=True
        )  # [n, cap]: row j = ids device j asked me for
        lid = peer_req.reshape(-1) - shard * local_v
        in_range = (lid >= 0) & (lid < local_v)
        rows = jnp.take(local_table, jnp.clip(lid, 0, local_v - 1), axis=0)
        rows = jnp.where(in_range[:, None], rows, 0).reshape(n, cap, d)
        # 4. rows back to requesters; undo the bucketing + dedup
        got = jax.lax.all_to_all(
            rows, axis, split_axis=0, concat_axis=0, tiled=True
        )  # [n, cap]: got[j, s] answers my req[j, s]
        flat = jnp.where(ok, owner * cap + within, 0)
        urows = jnp.take(got.reshape(n * cap, d), flat, axis=0)
        urows = jnp.where(ok[:, None], urows, 0)
        return jnp.take(urows, pos2slot, axis=0)  # [b, D]

    return _lookup(table, ids)


def shard_table_column(mesh: Mesh, table: jax.Array, axis: str = "model") -> jax.Array:
    """Place a [V, D] table column-sharded over `axis` (D must divide evenly)."""
    assert table.shape[1] % mesh.shape[axis] == 0, (table.shape, mesh.shape[axis])
    return jax.device_put(table, NamedSharding(mesh, P(None, axis)))


def sharded_lookup_column(
    mesh: Mesh,
    table: jax.Array,  # [V, D] sharded P(None, axis)
    ids: jax.Array,  # [B] int, sharded P(axis)
    axis: str = "model",
) -> jax.Array:
    """Column-sharded lookup → [B, D] sharded P(axis).

    Each chip holds every row's D/n column slice, so a lookup is: all-gather
    the batch-sharded ids (cheap: B ints), gather the local column slice for
    ALL B ids, then one `all_to_all` that splits the batch back and
    concatenates the column slices — O(B·D/n · n) = O(B·D) ICI traffic per
    chip, independent of the id distribution (vs the row split's
    O(unique·D)). Column sharding wins for small-vocab/wide tables where row
    hashing would leave shards unbalanced. ids == V (padding) → zero rows.
    """
    n = mesh.shape[axis]
    v, d = table.shape

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(None, axis), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )
    def _lookup(local_cols, local_ids):  # [V, D/n], [b]
        all_ids = jax.lax.all_gather(local_ids, axis, tiled=True)  # [B]
        valid = (all_ids >= 0) & (all_ids < v)
        cols = jnp.take(local_cols, jnp.clip(all_ids, 0, v - 1), axis=0)
        cols = jnp.where(valid[:, None], cols, 0)  # [B, D/n]
        return jax.lax.all_to_all(
            cols, axis, split_axis=0, concat_axis=1, tiled=True
        )  # [b, D]

    return _lookup(table, ids)
