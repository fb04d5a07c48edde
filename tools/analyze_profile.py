"""Decompose device step time from a jax.profiler trace (xplane.pb).

The profiling loop the reference lacks (SURVEY.md §5.1 — it has wall-clock
timers only): run a trace window via ``trainer.train(profile_dir=...)`` or
``jax.profiler.start_trace``, then run this to turn the raw xplane proto
into a per-op / per-category device-time table with roofline columns
(bound_by, HBM bandwidth, FLOP rate). This is the tool behind the
"training step anatomy" tables in docs/PERF.md.

Usage:
    python tools/analyze_profile.py /tmp/profile_dir [--steps N] [--top 30]
        [--json out.json] [--contains substr]

``--steps N`` divides totals by N to report per-step numbers (pass the
number of profiled steps inside the trace window).
"""

from __future__ import annotations

import argparse
import collections
import glob
import json
import os
import re
import sys


def find_xplane(path: str) -> str:
    if os.path.isfile(path):
        return path
    hits = sorted(
        glob.glob(os.path.join(path, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime,
    )
    if not hits:
        raise SystemExit(f"no *.xplane.pb under {path}")
    return hits[-1]


def load_hlo_stats(xplane: str) -> list[dict]:
    """Parse the hlo_stats tool table into a list of row dicts."""
    from xprof.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data([xplane], "hlo_stats", {})
    table = json.loads(data if isinstance(data, str) else data.decode())
    cols = [c["id"] for c in table["cols"]]
    rows = []
    for r in table.get("rows", []):
        rows.append({k: c.get("v") for k, c in zip(cols, r["c"])})
    return rows


def source_stack(row: dict) -> list[str]:
    """source_info is an HTML cell whose title attr holds the frame stack."""
    src = row.get("source_info") or ""
    m = re.search(r"title='([^']*)'", src)
    return [f for f in (m.group(1).split("\n") if m else []) if f]


def repo_frame(row: dict) -> str:
    """Innermost stack frame inside the repo (not tools/), else innermost."""
    frames = source_stack(row)
    for f in frames:
        if "/recommend_tpu/" in f:
            return f.split("/recommend_tpu/", 1)[1].rsplit(":", 1)[0]
    return frames[0].rsplit(":", 1)[0] if frames else "?"


def short_name(row: dict, width: int = 60) -> str:
    name = row.get("hlo_op_name") or "?"
    src = repo_frame(row)
    if src != "?":
        name = f"{name}  [{src}]"
    return name if len(name) <= width else name[: width - 1] + "…"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("path", help="profile dir or .xplane.pb file")
    ap.add_argument("--steps", type=int, default=1,
                    help="profiled steps in the window (normalizes to /step)")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--contains", default=None,
                    help="also print every op whose name contains this")
    ap.add_argument("--json", dest="json_out", default=None)
    args = ap.parse_args()

    xplane = find_xplane(args.path)
    print(f"# {xplane}", file=sys.stderr)
    rows = load_hlo_stats(xplane)
    if not rows:
        raise SystemExit("hlo_stats empty — was the trace taken on a device "
                         "backend (TPU)? CPU traces carry no HLO stats.")

    n = max(args.steps, 1)
    total_us = sum(r.get("total_self_time") or 0.0 for r in rows)
    if total_us <= 0:
        raise SystemExit("hlo_stats rows carry no device self time — "
                         "truncated or host-only capture?")
    print(f"device self time: {total_us / 1e3 / n:.2f} ms/step "
          f"({total_us / 1e3:.1f} ms over {n} steps, {len(rows)} ops)\n")

    # --- per-category rollup ------------------------------------------------
    by_cat: dict[str, list[float]] = collections.defaultdict(lambda: [0.0, 0])
    for r in rows:
        c = by_cat[r.get("category") or "?"]
        c[0] += r.get("total_self_time") or 0.0
        c[1] += r.get("occurrences") or 0
    print(f"{'category':<28}{'ms/step':>9}{'%':>7}{'#ops/step':>11}")
    for cat, (us, occ) in sorted(by_cat.items(), key=lambda kv: -kv[1][0]):
        print(f"{cat:<28}{us / 1e3 / n:>9.2f}{us / total_us * 100:>6.1f}%"
              f"{occ / n:>11.1f}")

    # --- top ops ------------------------------------------------------------
    rows.sort(key=lambda r: -(r.get("total_self_time") or 0.0))
    print(f"\n{'ms/step':>8} {'%':>6} {'cum%':>6} {'n/st':>5} "
          f"{'bound':<8} {'GiB/s':>7} {'GF/s':>8}  op")
    cum = 0.0
    for r in rows[: args.top]:
        us = r.get("total_self_time") or 0.0
        cum += us
        print(f"{us / 1e3 / n:>8.3f} {us / total_us * 100:>5.1f}% "
              f"{cum / total_us * 100:>5.1f}% "
              f"{(r.get('occurrences') or 0) / n:>5.1f} "
              f"{(r.get('bound_by') or '?'):<8} "
              f"{r.get('measured_memory_bw') or 0:>7.1f} "
              f"{r.get('model_flop_rate') or 0:>8.1f}  {short_name(r, 70)}")

    # --- per-source rollup (innermost repo frame) ---------------------------
    by_src: dict[str, float] = collections.defaultdict(float)
    for r in rows:
        by_src[repo_frame(r)] += r.get("total_self_time") or 0.0
    print(f"\n{'ms/step':>8} {'%':>6}  source (innermost repo frame)")
    for src, us in sorted(by_src.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{us / 1e3 / n:>8.3f} {us / total_us * 100:>5.1f}%  {src}")

    if args.contains:
        print(f"\nops containing '{args.contains}':")
        for r in rows:
            if args.contains in (r.get("hlo_op_name") or ""):
                us = r.get("total_self_time") or 0.0
                print(f"{us / 1e3 / n:>8.3f} ms/step  {short_name(r, 90)}")

    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump({"xplane": xplane, "steps": n,
                       "total_self_time_us": total_us, "rows": rows}, f)
        print(f"\nwrote {args.json_out}", file=sys.stderr)


if __name__ == "__main__":
    main()
