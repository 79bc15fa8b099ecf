"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Each query is forced end-to-end with a noop-sink write (full column
materialization — a bare count() would let Catalyst prune the very
kernels being measured). Also reports rows/sec for the flagship
spatial join (BASELINE.md #1).

Scaling evidence (BASELINE.md #5) is produced by BENCH/run_scaling.py,
which invokes this file at two parallelism levels.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from s2geometry_spark.demo_regions import demo_regions
    from s2geometry_spark.operators.knn import demo_knn_queries, knn_join
    from s2geometry_spark.operators.pip_join import pip_join
    from s2geometry_spark.session import get_spark
    from s2geometry_spark.sources.pages import geocode_pages, load_pages

    spark = get_spark("bench", cores=cpus, shuffle_partitions=cpus)
    n_rows = spark.read.parquet(f"{sf_dir}/documents.parquet").count()

    timings: dict[str, float] = {}

    def bench(name, fn, repeat=1):
        best = None
        for _ in range(repeat):
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 4)
        return best

    # warm the JVM + Python workers once (excluded from timings)
    force(load_pages(spark, sf_dir).select("cell_id"))

    pages = load_pages(spark, sf_dir)
    regs = demo_regions()

    bench("geocode", lambda: force(
        load_pages(spark, sf_dir).select("url", "lat", "lng", "cell_id",
                                         "cell_l4", "cell_l8", "cell_l12")))
    bench("pip_equi", lambda: force(
        pip_join(pages, spark, regs, strategy="equi", level=4)
        .select("url", "region_id")))
    bench("pip_range", lambda: force(
        pip_join(pages, spark, regs, strategy="range", max_cells=64)
        .select("url", "region_id")))
    bench("tile_counts", lambda: force(
        pages.groupBy("cell_l8").count()))
    bench("knn", lambda: force(
        knn_join(pages, spark, demo_knn_queries())))

    total = round(sum(timings.values()), 4)
    flagship_rows_per_sec = round(n_rows / timings["pip_equi"], 1)
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir.rstrip("/").split("/")[-1],
        "rows": n_rows,
        "cpus": cpus,
        "flagship_rows_per_sec": flagship_rows_per_sec,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
