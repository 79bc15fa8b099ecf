"""Driver-side kNN enumeration scaling evidence (round-4 verdict #4).

Measures the candidate-cell ring enumeration ALONE (no Spark jobs) —
the part that ran as a Python set-BFS per query in round 3 — at
growing query counts, comparing:

  * batched : ONE _batched_ring_cells call over all centers
              (one all_neighbors kernel call per BFS step, total).
  * per-query: the round-3 shape — one BFS per center (emulated by
              calling the same kernel with a single center N times).

Run: python BENCH/knn_driver_scaling.py   (~1 min, driver-only).
Prints one JSON line; numbers are recorded in BENCH/BASELINE.md.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from s2geometry_spark import kernels as K
from s2geometry_spark.operators import knn

LEVEL = 8
RADIUS = 8          # the R_MAX_RING worst case: full 17x17 ring per query


def centers_for(n: int) -> np.ndarray:
    # deterministic spread of query points (same LCG as demo_knn_queries)
    h1 = (np.arange(n, dtype=np.int64) * 48271 + 12345) % 2147483647
    h2 = (h1 * 69621 + 7) % 2147483647
    lat = (h1 / 2147483647.0) * 170.0 - 85.0
    lng = (h2 / 2147483647.0) * 360.0 - 180.0
    return K.parent(K.latlng_degrees_to_cell_id(lat, lng), LEVEL)


PER_QUERY_CAP = 1_000   # the per-query path is linear by construction
                        # (~47 ms/query measured); emulating it at 10^4
                        # would take ~8 min for a number we can read off
                        # the smaller points


def main() -> None:
    out = {"level": LEVEL, "radius": RADIUS, "points": []}
    for n in (100, 1_000, 10_000):
        centers = centers_for(n)
        t0 = time.perf_counter()
        owners, cells = knn._batched_ring_cells(centers, RADIUS)
        t_batched = time.perf_counter() - t0
        point = {
            "n_queries": n,
            "cells": int(cells.size),
            "batched_sec": round(t_batched, 3),
            "batched_ms_per_query": round(1e3 * t_batched / n, 2),
        }
        if n <= PER_QUERY_CAP:
            t0 = time.perf_counter()
            total = 0
            for c in centers:
                _, cs = knn._batched_ring_cells(
                    np.array([c], dtype=np.uint64), RADIUS)
                total += cs.size
            t_perq = time.perf_counter() - t0
            assert total == cells.size  # same enumeration either way
            point["per_query_sec"] = round(t_perq, 3)
            point["speedup"] = round(t_perq / t_batched, 1)
        out["points"].append(point)
    print(json.dumps(out))
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "knn_driver.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
