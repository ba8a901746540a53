#!/usr/bin/env python
"""Merge chain-21 cavity3d results (campaigns/r3chain21/*.json) into
BENCH_LARGE.json as labeled 3-D cached-series entries.

Each bench stdout file's last line is the one-line JSON record
({"metric": "cavity3d_steps_per_sec@<n>dof", ...}); stages that OOM'd
or timed out leave an empty .json and are reported, not merged.
Idempotent: an entry with the same (metric, mode_3d) pair is replaced
(metric alone collides between fused and granular at the same N).
"""
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CAMP = os.path.join(ROOT, "campaigns", "r3chain21")
LARGE = os.path.join(ROOT, "BENCH_LARGE.json")

STAGES = {
    "c3d32_repin.json": ("fused", 32),
    "c3d48_fused.json": ("fused", 48),
    "c3d48_gran.json": ("granular", 48),
    "c3d64_gran.json": ("granular", 64),
    "c3d64_fused.json": ("fused", 64),
}


def main():
    with open(LARGE) as fh:
        large = json.load(fh)
    merged, missing = [], []
    for fname, (mode, n) in STAGES.items():
        path = os.path.join(CAMP, fname)
        line = None
        if os.path.exists(path):
            lines = [
                l for l in open(path).read().splitlines()
                if l.strip().startswith("{")
            ]
            if lines:
                try:
                    line = json.loads(lines[-1])
                    line["metric"], line["value"]
                except (ValueError, KeyError):
                    # stage killed by `timeout` mid-print: report as
                    # missing instead of aborting the whole merge
                    line = None
        if line is None:
            missing.append(fname)
            continue
        n_dofs = int(line["metric"].split("@")[1].rstrip("dof"))
        entry = {
            "n_dofs": n_dofs,
            "steps_per_sec": line["value"],
            "measured": (
                f"2026-08-20 r3_chain21 (cavity3d N={n} {mode}, "
                "value-readback-synced, real v5e chip)"
            ),
            "config": (
                f"cavity3d N={n} P2/P1 tets, lagged convection, {mode} "
                "mode" + (", EMA off (N>=64 fallback)" if n >= 64 else "")
            ),
            "metric": line["metric"],
            "mode_3d": mode,
        }
        large["entries"] = [
            e for e in large["entries"]
            if not (
                e.get("metric") == entry["metric"]
                and e.get("mode_3d") == mode
            )
        ] + [entry]
        merged.append((fname, line["value"]))
    with open(LARGE, "w") as fh:
        json.dump(large, fh, indent=1)
        fh.write("\n")
    print("merged:", merged)
    print("missing/failed stages:", missing)
    return 0


if __name__ == "__main__":
    sys.exit(main())
