"""Covering-based containment joins — the flagship operators (E3′).

Two physical strategies over the same logical query
"pages whose point lies inside region R":

* ``equi``  (SURVEY B6): uniform-level covering; broadcast hash join
  ``pages.cell_l{K} == coverings.cell_id``. **No shuffle of pages** —
  the central performance property at 10^12 rows (asserted via
  plans/explain.py in benches). Each page has exactly one level-K cell
  and covering cells are distinct, so no dedup is needed.

* ``range`` (SURVEY B8): hierarchical best-first covering (max_cells
  bound); broadcast range join ``cell_key BETWEEN range_min_key AND
  range_max_key`` (BroadcastNestedLoopJoin — fine because coverings are
  tiny). Covering cells are mutually disjoint by construction
  (tests/test_coverer.py), so again no dedup.

Both then apply the exact vectorized containment test ONLY to
non-interior candidate rows (the coverer's interior short-circuit,
SURVEY §4.1) inside one Arrow-batched pandas UDF.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (BooleanType, IntegerType, LongType,
                               StructField, StructType)

from .. import kernels as K
from ..coverer import covering_rows
from ..functions import geo

COVERINGS_SCHEMA = StructType([
    StructField("region_id", LongType(), False),
    StructField("cell_id", LongType(), False),
    StructField("level", IntegerType(), False),
    StructField("range_min_key", LongType(), False),
    StructField("range_max_key", LongType(), False),
    StructField("is_interior", BooleanType(), False),
])


def coverings_df(spark: SparkSession, regions, uniform_level: int | None = None,
                 max_cells: int = 64, max_level: int = 30,
                 mode: str = "level_sync") -> DataFrame:
    """The `coverings` dimension table (SURVEY §1.2) — always
    broadcastable. mode: "level_sync" | "best_first" (tighter covering
    per cell budget — see coverer.covering_best_first)."""
    rows = []
    for reg in regions:
        rows.extend(covering_rows(reg, max_cells=max_cells, max_level=max_level,
                                  uniform_level=uniform_level, mode=mode))
    return spark.createDataFrame(rows, COVERINGS_SCHEMA)


def make_contains_udf(regions):
    """Vectorized exact containment predicate, dispatched by region_id.

    The (tiny) region list is captured in the closure and shipped once
    per executor. Runs numpy kernels per Arrow batch; polygon rows get
    the exact-arithmetic fallback for near-degenerate points.
    """
    from ..regions import Cap, Polygon, Polyline, Rect, RegionUnion

    by_id = {r.region_id: r for r in regions}

    @pandas_udf(BooleanType())
    def contains_udf(region_id: pd.Series, lat_deg: pd.Series,
                     lng_deg: pd.Series,
                     is_interior: pd.Series) -> pd.Series:
        rid = region_id.to_numpy("int64")
        interior = is_interior.to_numpy("bool")
        lat = np.radians(lat_deg.to_numpy("float64"))
        lng = np.radians(lng_deg.to_numpy("float64"))
        out = interior.copy()  # interior-cell rows are contained a priori
        x = y = z = None
        for r_id in np.unique(rid[~interior]):
            reg = by_id[int(r_id)]
            m = (rid == r_id) & ~interior
            if isinstance(reg, Rect):
                out[m] = reg.contains_points_np(lat[m], lng[m])
                continue
            if x is None:
                x, y, z = K.latlng_to_xyz(lat, lng)
            if isinstance(reg, RegionUnion):
                # pass the original radians through so Rect members
                # test on them, not a xyz round-trip (regions.py note)
                out[m] = reg.contains_points_np(x[m], y[m], z[m],
                                                lat=lat[m], lng=lng[m])
            elif isinstance(reg, (Cap, Polygon, Polyline)):
                out[m] = reg.contains_points_np(x[m], y[m], z[m])
            else:  # pragma: no cover
                raise TypeError(f"unknown region type {type(reg)}")
        return pd.Series(out)

    return contains_udf


def make_region_mask_udf(regions, level: int, max_cells: int = 64):
    """One-pass PIP: a single pandas UDF that runs the covering
    prefilter (np.isin against each region's covering-cell set at
    `level`) AND the exact containment test, returning a per-row region
    bitmask. The strategy="map" physical plan built on this has NO join
    and only ONE JVM→Python hop — see pip_join docstring."""
    from ..coverer import covering_rows

    prepared = []  # (bit, region, interior_cells, boundary_cells)
    for bit, reg in enumerate(regions):
        rows = covering_rows(reg, max_cells=max_cells, uniform_level=level)
        interior = np.array([r["cell_id"] for r in rows if r["is_interior"]],
                            dtype=np.int64)
        boundary = np.array([r["cell_id"] for r in rows
                             if not r["is_interior"]], dtype=np.int64)
        prepared.append((bit, reg, interior, boundary))

    @pandas_udf(LongType())
    def mask_udf(cell_l: pd.Series, lat_deg: pd.Series,
                 lng_deg: pd.Series) -> pd.Series:
        from ..regions import RegionUnion, Rect
        ids = cell_l.to_numpy("int64")
        lat = np.radians(lat_deg.to_numpy("float64"))
        lng = np.radians(lng_deg.to_numpy("float64"))
        mask = np.zeros(len(ids), dtype=np.int64)
        x = y = z = None
        for bit, reg, interior, boundary in prepared:
            inside = np.isin(ids, interior)
            bnd = np.isin(ids, boundary)
            if bnd.any():
                if isinstance(reg, Rect):
                    inside[bnd] = reg.contains_points_np(lat[bnd], lng[bnd])
                else:
                    if x is None:
                        x, y, z = K.latlng_to_xyz(lat, lng)
                    if isinstance(reg, RegionUnion):
                        inside[bnd] = reg.contains_points_np(
                            x[bnd], y[bnd], z[bnd],
                            lat=lat[bnd], lng=lng[bnd])
                    else:
                        inside[bnd] = reg.contains_points_np(x[bnd], y[bnd],
                                                             z[bnd])
            mask |= inside.astype(np.int64) << bit
        return pd.Series(mask)

    return mask_udf


def pip_join(pages: DataFrame, spark: SparkSession, regions,
             strategy: str = "equi", level: int = 8,
             max_cells: int = 64,
             cover_mode: str = "level_sync",
             hot_threshold: int | None = None,
             n_salt: int = 8) -> DataFrame:
    """pages ⋈ regions containment join → (url, region_id, ...pages cols).

    `pages` must carry lat, lng and (for equi) cell_l{level} or (for
    range) cell_id — i.e. anything from sources.pages.geocode_pages.

    Strategies (all verified row-identical):
    * "equi"  — broadcast hash join on the uniform-level covering +
      exact post-filter UDF. Two Python hops (geocode upstream +
      containment) — the general shape; coverings can be any size.
    * "range" — hierarchical covering, broadcast BETWEEN join.
    * "map"   — NO JOIN: one pandas UDF computes a per-row region
      bitmask (np.isin covering prefilter + exact test fused), then
      set bits explode to region_id rows. One Python hop total,
      map-only plan end-to-end. Measured comparable to "equi" at 10M
      rows x 8 regions (the equi join prunes rows before its exact
      UDF, offsetting the extra hop) — its value is structural: a
      join-free PIP drops straight into Structured Streaming (where
      stream-static join + watermark combinations are restricted) and
      into mapInPandas pipelines. <= 63 regions per call (bitmask);
      shard larger catalogs across calls.
    * "salted" — the NON-broadcast scale path (tiles.salted_equi_join):
      shuffle-hash join on (tile, salt) with hot tiles fanned out
      n_salt ways, for region catalogs too big to broadcast (10^6+
      covering rows at 100 TB). `hot_threshold` picks the hot tiles
      from one histogram pass over pages (rows-per-tile > threshold;
      the pass costs one extra job — production caches/persists the
      histogram alongside the tile layout). Row-identical to "equi"
      (same uniform-level covering + exact filter; asserted in
      tests/test_scale_ops.py, oracle-gated as pip_salted_shuffle).
    """
    if strategy == "map":
        if len(regions) > 63:
            raise ValueError("map strategy: <= 63 regions per call")
        mask_udf = make_region_mask_udf(regions, level, max_cells)
        # No `.filter(_rmask != 0)` here: the explode of an empty hits
        # array below already drops non-matching rows, and an explicit
        # null-intolerant filter on the UDF column gets pushed through
        # the projection by Catalyst, re-inlining mask_udf AND the whole
        # upstream geocode chain into a second ArrowEvalPython cascade
        # over every scan row (same trap as the eqNullSafe note below;
        # single-evaluation asserted in tests/test_plans.py).
        masked = pages.withColumn(
            "_rmask", mask_udf(F.col(f"cell_l{level}"), F.col("lat"),
                               F.col("lng")))
        rid_hits = F.array(*[
            F.when(F.col("_rmask").bitwiseAND(F.lit(1 << bit)) != 0,
                   F.lit(int(reg.region_id)))
            for bit, reg in enumerate(regions)])
        return (masked
                .withColumn("region_id",
                            F.explode(F.filter(rid_hits,
                                               lambda v: v.isNotNull())))
                .drop("_rmask"))
    contains_udf = make_contains_udf(regions)
    if strategy == "salted":
        from .tiles import hot_tiles, salted_equi_join
        cov = coverings_df(spark, regions, uniform_level=level)
        cov_sel = cov.select("region_id", "cell_id", "is_interior")
        hot = hot_tiles(pages, level,
                        hot_threshold if hot_threshold is not None else 0)
        joined = salted_equi_join(pages, cov_sel, level, hot,
                                  n_salt=n_salt).drop("cell_id")
    elif strategy == "equi":
        cov = coverings_df(spark, regions, uniform_level=level)
        cov_sel = cov.select("region_id",
                             F.col("cell_id").alias("_cov_cell"),
                             "is_interior")
        # Null-safe equality (<=>) instead of `=`: with a plain equality
        # key Catalyst infers `isnotnull(cell_l{K})` for the join, pushes
        # it through the geocode projection, and re-inlines the ENTIRE
        # cell_id_udf chain into a second ArrowEvalPython over every scan
        # row — doubling the Python-kernel bill (the dominant per-row
        # cost) at 10^12 rows. `<=>` is not null-intolerant, so no
        # isnotnull constraint is generated and the kernel runs exactly
        # once (asserted in tests/test_plans.py). Row-identical to `=`
        # here: COVERINGS_SCHEMA declares cell_id non-nullable, so
        # null<=>null matches cannot occur; BroadcastHashJoin supports
        # null-safe keys natively.
        joined = pages.join(
            F.broadcast(cov_sel),
            pages[f"cell_l{level}"].eqNullSafe(cov_sel["_cov_cell"]),
            "inner").drop("_cov_cell")
    elif strategy == "range":
        # cover_mode="best_first" trades more covering cells (more
        # BETWEEN probes per row in the broadcast nested-loop join —
        # cheap JVM comparisons) for a 2-30x tighter covered area, i.e.
        # proportionally fewer candidate rows entering the Python exact
        # containment UDF (the expensive per-row step). Results are
        # identical either way (superset covering + exact filter).
        cov = coverings_df(spark, regions, max_cells=max_cells,
                           mode=cover_mode)
        pages_k = pages.withColumn("cell_key", geo.cell_order_key_udf(F.col("cell_id")))
        # coalesce(cond, false) wraps the BETWEEN so it is not
        # null-intolerant — same double-UDF-evaluation guard as the
        # eqNullSafe above (here the inferred `isnotnull(cell_key)`
        # would re-inline BOTH cell_id_udf and cell_order_key_udf).
        # Identical semantics: a null comparison never matched anyway.
        joined = pages_k.join(
            F.broadcast(cov.select("region_id", "range_min_key", "range_max_key",
                                   "is_interior")),
            F.coalesce((F.col("cell_key") >= cov["range_min_key"])
                       & (F.col("cell_key") <= cov["range_max_key"]),
                       F.lit(False)), "inner")
    else:
        raise ValueError(strategy)
    # One pass with the interior flag pushed INTO the UDF. Two rejected
    # alternatives, measured at 10M rows: (a) `is_interior | udf(...)`
    # — Spark extracts the UDF into ArrowEvalPython and runs the
    # geometry for every row including interior ones; (b) splitting
    # into interior/boundary streams and unioning — Spark does not
    # share the common subplan, so the scan+geocode+join upstream runs
    # TWICE (8.7s → 11.5s). Passing the flag lets numpy skip the
    # geometry for interior rows while keeping a single pipeline.
    return joined.filter(
        contains_udf(F.col("region_id"), F.col("lat"), F.col("lng"),
                     F.col("is_interior")))


def region_overlap_candidates(cov_a: DataFrame, cov_b: DataFrame,
                              broadcast_b: bool = True,
                              same_collection: bool = True) -> DataFrame:
    """(region_a, region_b) distinct may-intersect candidate pairs
    between two region collections, from their coverings alone — the
    polygon x polygon analogue of the point-in-region covering join.

    Correctness lever: S2 cell ranges NEST OR ARE DISJOINT (SURVEY
    §2.2), so two covering cells share area iff their leaf ranges
    overlap as intervals, i.e. one is an ancestor-or-equal of the
    other. Coverings are supersets of their regions, so the pair set
    is a guaranteed SUPERSET of truly-intersecting pairs (tested via
    shared-point witnesses in tests/test_scale_ops.py) — feed an exact
    geometry predicate downstream to confirm, exactly like pip_join's
    candidates->verify split.

    Scale shape: region catalogs are dimension-sized next to a page
    corpus; the smaller side broadcasts and only (region_a, region_b)
    id pairs survive to the distinct. For two HUGE catalogs, swap the
    broadcast range join for the equi path both sides already carry:
    re-tile both coverings to a common level (kernels.parent) and
    equi-join on the tile, the same trick salted_equi_join uses.
    `same_collection=True` (the self-join case): `region_a < region_b`
    drops self-pairs and mirror duplicates. For TWO DISTINCT catalogs
    pass `same_collection=False` — the ids live in different
    namespaces, so the `<` filter would silently drop every pair whose
    a-side id happens to be >= the b-side id (review finding r4) and
    there are no mirrors to dedup in the first place.
    """
    a = cov_a.select(F.col("region_id").alias("region_a"),
                     F.col("range_min_key").alias("_amin"),
                     F.col("range_max_key").alias("_amax"))
    b = cov_b.select(F.col("region_id").alias("region_b"),
                     F.col("range_min_key").alias("_bmin"),
                     F.col("range_max_key").alias("_bmax"))
    if broadcast_b:
        b = F.broadcast(b)
    cond = (F.col("_amin") <= F.col("_bmax")) \
        & (F.col("_bmin") <= F.col("_amax"))
    if same_collection:
        cond = cond & (F.col("region_a") < F.col("region_b"))
    return (a.join(b, cond)
            .select("region_a", "region_b")
            .distinct())
