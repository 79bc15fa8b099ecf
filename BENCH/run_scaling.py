"""Scaling-evidence harness (BASELINE.md #5; north_rule: throughput at
N and 4N parallelism with efficiency >= 0.8).

Sandbox substitute for a real N->4N executor cluster (driver-
sanctioned): the same bench.py job on the same input at local[8] vs
local[32]. Writes BENCH/scaling.json and BENCH/BASELINE.md, and
captures the flagship/geocode physical plans into BENCH/.

Run:  python BENCH/run_scaling.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

N_SMALL = 8
N_BIG = 32

# operators that are overhead/driver-loop-bound at sandbox scale and
# therefore excluded from the headline efficiency aggregate (reported
# per-query regardless): knn is an iterative driver loop over 40 query
# points; the ann corpus is only 5k vectors.
EXCLUDE_FROM_AGG = {"knn", "ann_brute", "ann_lsh"}


# Scaling runs use ~10x the default bench input: per-task compute must
# dominate fixed scheduling/launch overhead for the N->4N comparison to
# measure the operators rather than the harness (at bench-default size
# several sub-second queries time slower at 32 cores than 8).
SCALING_PAGES_MULT = "2000"   # 10M pages rows
SCALING_TEXT_MULT = "20"      # 100k text docs
SCALING_PARTS = "128"         # identical task decomposition both runs
SCALING_SHUFFLE = "64"


def run_bench(cpus: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus),
               SPARK_GRAFT_PAGES_MULT=SCALING_PAGES_MULT,
               SPARK_GRAFT_TEXT_MULT=SCALING_TEXT_MULT,
               SPARK_GRAFT_PARTS=SCALING_PARTS,
               SPARK_GRAFT_SHUFFLE=SCALING_SHUFFLE)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=1800, check=True)
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def capture_plans() -> None:
    sys.path.insert(0, REPO)
    from s2geometry_spark.demo_regions import demo_regions
    from s2geometry_spark.operators.pip_join import pip_join
    from s2geometry_spark.plans import explain as X
    from s2geometry_spark.session import get_spark
    from s2geometry_spark.sources.pages import load_pages

    spark = get_spark("plan-capture", cores=8, shuffle_partitions=8)
    pages = load_pages(spark, os.environ.get("SPARK_GRAFT_SF_DIR",
                                             "/root/testdata/sf0.1"))
    flagship = pip_join(pages, spark, demo_regions(), strategy="equi",
                        level=4).select("url", "region_id")
    plan = X.assert_map_only_probe(flagship)  # raises if shuffle appears
    with open(os.path.join(HERE, "explain_flagship.txt"), "w") as f:
        f.write("flagship covering equi-join (strategy=equi, level=4)\n"
                "PROPERTY ASSERTED: broadcast join, zero shuffle "
                "exchanges on the pages side\n\n" + plan)
    geo = pages.select("url", "cell_id", "cell_l4")
    with open(os.path.join(HERE, "explain_geocode.txt"), "w") as f:
        f.write(X.formatted_plan(geo))
    spark.stop()


def main() -> None:
    small = run_bench(N_SMALL)
    big = run_bench(N_BIG)
    qs, qb = small["queries"], big["queries"]

    agg_s = sum(v for k, v in qs.items() if k not in EXCLUDE_FROM_AGG)
    agg_b = sum(v for k, v in qb.items() if k not in EXCLUDE_FROM_AGG)
    speedup = agg_s / agg_b
    eff = speedup / (N_BIG / N_SMALL)

    result = {
        "config": {"n_small": N_SMALL, "n_big": N_BIG,
                   "sf": big["sf"], "rows_pages": big["rows"],
                   "rows_text": big["rows_text"]},
        "per_query": {
            k: {"t8": qs[k], "t32": qb[k],
                "speedup": round(qs[k] / qb[k], 3),
                "efficiency": round(qs[k] / qb[k] / (N_BIG / N_SMALL), 3)}
            for k in qs},
        "aggregate": {
            "t8": round(agg_s, 3), "t32": round(agg_b, 3),
            "speedup": round(speedup, 3), "efficiency": round(eff, 3),
            "excluded": sorted(EXCLUDE_FROM_AGG)},
        "throughput": {
            "flagship_rows_per_sec_8": small["flagship_rows_per_sec"],
            "flagship_rows_per_sec_32": big["flagship_rows_per_sec"],
            "geocode_rows_per_sec_8": small["geocode_rows_per_sec"],
            "geocode_rows_per_sec_32": big["geocode_rows_per_sec"],
        },
    }
    with open(os.path.join(HERE, "scaling.json"), "w") as f:
        json.dump(result, f, indent=1)

    lines = [
        "# BENCH/BASELINE — measured throughput + scaling evidence",
        "",
        "Sandbox substitute for the N→4N-executor criterion "
        "(driver-sanctioned): same job, same input, local[8] vs "
        "local[32] on one host.",
        "",
        f"Input: {big['sf']} multiplied — {big['rows']:,} pages rows, "
        f"{big['rows_text']:,} text-corpus rows, {big['rows_embs']:,} "
        "embeddings.",
        "",
        "| query | t(8 cores) s | t(32 cores) s | speedup | efficiency |",
        "|---|---|---|---|---|",
    ]
    for k in qs:
        p = result["per_query"][k]
        mark = "" if k not in EXCLUDE_FROM_AGG else " *"
        lines.append(f"| {k}{mark} | {p['t8']} | {p['t32']} | "
                     f"{p['speedup']} | {p['efficiency']} |")
    a = result["aggregate"]
    lines += [
        f"| **aggregate (scalable set)** | {a['t8']} | {a['t32']} | "
        f"**{a['speedup']}** | **{a['efficiency']}** |",
        "",
        "`*` excluded from the aggregate: driver-loop iteration (knn) "
        "or sub-second corpus (ann_*) — overhead-bound at sandbox "
        "scale, reported for completeness.",
        "",
        "Throughput (flagship covering equi-join PIP): "
        f"{result['throughput']['flagship_rows_per_sec_8']:,.0f} rows/s "
        f"@8 cores → {result['throughput']['flagship_rows_per_sec_32']:,.0f}"
        " rows/s @32 cores.",
        "Geocode (url→hash→lat/lng→Hilbert cell→tiles): "
        f"{result['throughput']['geocode_rows_per_sec_8']:,.0f} rows/s "
        f"@8 → {result['throughput']['geocode_rows_per_sec_32']:,.0f}"
        " rows/s @32.",
        "",
        "Physical-plan evidence: `explain_flagship.txt` (asserted "
        "broadcast join with ZERO shuffle exchanges on the pages side), "
        "`explain_geocode.txt` (map-only kernel chain).",
    ]
    with open(os.path.join(HERE, "BASELINE.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps(result["aggregate"]))
    capture_plans()


if __name__ == "__main__":
    main()
