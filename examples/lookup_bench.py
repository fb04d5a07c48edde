"""Sharded embedding-lookup protocol comparison — GSPMD automatic vs the
explicit shard_map protocols (psum / dedup+all-to-all / column).

VERDICT round-1 item 4 asked for a measured basis for the training default
(the GSPMD automatic path). This bench runs fwd and fwd+bwd lookups on a
row-sharded [V, D] table over a ('data','model') mesh and reports per-call
wall time plus the analytic per-chip ICI traffic of each protocol.

On a CPU virtual mesh (the only multi-device environment available without
a pod slice) the timings are DIRECTIONAL ONLY — CPU "collectives" are memcpy,
so the numbers measure op-count/markup overhead, not ICI. The traffic model
is the part that transfers to hardware:

  protocol   fwd ICI bytes/chip           notes
  gspmd      XLA-chosen (all-gather of    fuses into the surrounding program;
             gathered rows or psum)       semantics == psum variant
  psum       B·D·4 (one psum)             every chip gathers, zero for
                                          non-owned rows, psum assembles
  a2a        2·min(uniq,n·cap)·D·4 / n    dedup first ⇒ O(unique) not O(B);
                                          wins when batches repeat hot ids
  column     B·D·4 (all_to_all)           D split; traffic independent of
                                          id distribution

Usage:
    JAX_PLATFORMS=cpu python examples/lookup_bench.py --devices 8
"""

from __future__ import annotations

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--vocab", type=int, default=262_144)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--batch", type=int, default=65_536)
    ap.add_argument("--zipf", type=float, default=1.1,
                    help="id distribution skew (recsys batches are Zipf)")
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax

    for key, val in (("jax_num_cpu_devices", args.devices),
                     ("jax_platforms", "cpu")):
        try:
            jax.config.update(key, val)
        except RuntimeError:
            break

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from recommend_tpu.parallel.embedding_sharding import (
        shard_table,
        shard_table_column,
        sharded_lookup,
        sharded_lookup_a2a,
        sharded_lookup_column,
    )
    from recommend_tpu.parallel.mesh import make_mesh

    n = args.devices
    mesh = make_mesh(data=1, model=n)
    rng = np.random.default_rng(0)
    v, d, b = args.vocab, args.dim, args.batch
    # Zipf-ish ids: rank r sampled ∝ r^-zipf (recsys popularity)
    ranks = rng.zipf(args.zipf, size=4 * b)
    ids_np = (ranks[ranks <= v] - 1)[:b].astype(np.int32)
    # spread hot ids over shards like a hashed id space would
    ids_np = (ids_np.astype(np.int64) * 2654435761 % v).astype(np.int32)
    uniq = len(np.unique(ids_np))
    table_np = rng.normal(size=(v, d)).astype(np.float32)

    t_row = shard_table(mesh, jnp.asarray(table_np))
    t_col = shard_table_column(mesh, jnp.asarray(table_np))
    ids_rep = jax.device_put(jnp.asarray(ids_np), NamedSharding(mesh, P()))
    ids_sh = jax.device_put(jnp.asarray(ids_np), NamedSharding(mesh, P("model")))

    def timed(f, *a):
        out = f(*a)
        jax.tree_util.tree_leaves(out)[0].block_until_ready()
        ts = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            out = f(*a)
            jax.tree_util.tree_leaves(out)[0].block_until_ready()
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts) * 1000)

    # GSPMD automatic: jnp.take on the sharded table under jit
    gspmd = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
    gspmd_g = jax.jit(jax.grad(lambda t, i: jnp.take(t, i, axis=0).sum(), argnums=0))
    psum = jax.jit(lambda t, i: sharded_lookup(mesh, t, i))
    psum_g = jax.jit(jax.grad(lambda t, i: sharded_lookup(mesh, t, i).sum(), argnums=0))
    a2a = jax.jit(lambda t, i: sharded_lookup_a2a(mesh, t, i))
    a2a_g = jax.jit(jax.grad(lambda t, i: sharded_lookup_a2a(mesh, t, i).sum(), argnums=0))
    col = jax.jit(lambda t, i: sharded_lookup_column(mesh, t, i))
    col_g = jax.jit(jax.grad(lambda t, i: sharded_lookup_column(mesh, t, i).sum(), argnums=0))

    mb = 1024 * 1024
    report = {
        "devices": n,
        "vocab": v, "dim": d, "batch": b, "unique_ids": uniq,
        "note": "CPU virtual mesh — timings directional; ICI model analytic",
        "ici_model_mb_per_chip": {
            "psum_or_gspmd": round(b * d * 4 / mb, 2),
            "a2a_dedup": round(2 * min(uniq, b) * d * 4 / n / mb, 2),
            "column": round(b * d * 4 / mb, 2),
        },
        "wall_ms": {
            "gspmd_fwd": timed(gspmd, t_row, ids_rep),
            "gspmd_bwd": timed(gspmd_g, t_row, ids_rep),
            "psum_fwd": timed(psum, t_row, ids_rep),
            "psum_bwd": timed(psum_g, t_row, ids_rep),
            "a2a_fwd": timed(a2a, t_row, ids_sh),
            "a2a_bwd": timed(a2a_g, t_row, ids_sh),
            "column_fwd": timed(col, t_col, ids_sh),
            "column_bwd": timed(col_g, t_col, ids_sh),
        },
    }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
