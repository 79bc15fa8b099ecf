"""Data-size scaling evidence — the second 100 TB axis.

run_scaling.py varies CORES at fixed data (the north rule's N->4N
criterion); this harness varies DATA at fixed cores: the spatial
north-rule query set (geocode -> covering joins -> tile agg, plus the
within-distance self-join) at 2.5M / 10M / 40M page rows on
local[32]. Input splits and shuffle partitions scale WITH the rows
(fixed ~78k rows/split), matching what maxPartitionBytes yields on a
real growing table — so per-task work is constant and the legs
measure how total cost grows with input size.

A scan-shaped operator should be LINEAR in rows here: t(40M) ~=
4 x t(10M). linearity := (t_small x rows_ratio) / t_big, 1.0 =
perfectly linear; > 1 means the big leg amortizes fixed overhead
(scheduler, broadcast build); materially < 1 would flag a
super-linear term that 100 TB would amplify (none expected: the
flagship join broadcasts a fixed dimension side, tile agg is
map-side-combined, dist_join holds r^2*n constant so pairs/point is
scale-invariant).

Writes BENCH/data_scaling.json and refreshes BASELINE.md via
run_scaling.write_baseline(). Run exclusively (no concurrent Spark —
same rule as run_scaling.py): python BENCH/run_data_scaling.py
"""

from __future__ import annotations

import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

from run_scaling import run_bench  # noqa: E402
import run_scaling  # noqa: E402

QUERIES = ("geocode", "pip_equi", "pip_range", "tile_counts",
           "dist_join")
CPUS = 32

# (pages_mult, parts, shuffle): 5k docs x mult; splits scale with rows
LEGS = [
    (500, "32", "16"),     # 2.5M rows
    (2000, "128", "64"),   # 10M rows
    (8000, "512", "256"),  # 40M rows
]


def main() -> None:
    os.environ["SPARK_GRAFT_ONLY"] = ",".join(QUERIES)
    legs = []
    for mult, parts, shuffle in LEGS:
        parsed = run_bench(CPUS, str(mult), "1", parts, shuffle)
        legs.append({
            "rows": parsed["rows"],
            "parts": int(parts), "shuffle": int(shuffle),
            "per_query": parsed["queries"],
            "geocode_rows_per_sec": parsed["geocode_rows_per_sec"],
            "flagship_rows_per_sec": parsed["flagship_rows_per_sec"],
            "cpu": parsed["_cpu"],
        })
        print(json.dumps(legs[-1]), flush=True)

    with open(os.path.join(HERE, "data_scaling.json"), "w") as f:
        json.dump({"cpus": CPUS, "queries": list(QUERIES),
                   "legs": legs}, f, indent=1)
    run_scaling.write_baseline()


if __name__ == "__main__":
    main()
