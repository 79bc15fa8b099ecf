"""Distributed covering generation — applyInPandas over a regions
DataFrame (SURVEY.md B22, lifecycle E2').

``coverings_df`` in pip_join.py builds coverings driver-side, which is
right for <= 10^4 regions. A 10^6-region catalog (e.g. every admin
polygon on earth) needs the coverer itself distributed: encode regions
as rows, group by region_id, run the numpy coverer per group inside an
Arrow-batched applyInPandas, explode to the standard coverings schema.
Output is verified row-identical to the driver-side path in
tests/test_scale_ops.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (ArrayType, DoubleType, IntegerType, LongType,
                               StringType, StructField, StructType)

from ..coverer import covering_rows
from ..regions import Cap, Polygon, Rect
from .pip_join import COVERINGS_SCHEMA

REGIONS_SCHEMA = StructType([
    StructField("region_id", LongType(), False),
    StructField("kind", StringType(), False),
    StructField("loop_idx", IntegerType(), False),
    StructField("depth", IntegerType(), False),
    StructField("params", ArrayType(DoubleType()), False),
    StructField("lats", ArrayType(DoubleType()), False),
    StructField("lngs", ArrayType(DoubleType()), False),
])


def regions_to_df(spark: SparkSession, regions) -> DataFrame:
    """Row encoding: caps/rects one row (params); polygons one row per
    loop (radian vertex arrays)."""
    rows = []
    for r in regions:
        if isinstance(r, Cap):
            rows.append((r.region_id, "cap", 0, 0,
                         [r.cx, r.cy, r.cz, r.height], [], []))
        elif isinstance(r, Rect):
            rows.append((r.region_id, "rect", 0, 0,
                         [r.lat_lo, r.lat_hi, r.lng_lo, r.lng_hi], [], []))
        elif isinstance(r, Polygon):
            for idx, (depth, lats, lngs) in enumerate(r.loops):
                rows.append((r.region_id, "polygon", idx, int(depth), [],
                             [float(v) for v in lats],
                             [float(v) for v in lngs]))
        else:  # pragma: no cover
            raise TypeError(type(r))
    return spark.createDataFrame(rows, REGIONS_SCHEMA)


def df_to_region(pdf: pd.DataFrame):
    """Rebuild one region object from its row group (worker side)."""
    kind = pdf.iloc[0]["kind"]
    rid = int(pdf.iloc[0]["region_id"])
    if kind == "cap":
        cx, cy, cz, height = pdf.iloc[0]["params"]
        return Cap(rid, float(cx), float(cy), float(cz), float(height))
    if kind == "rect":
        lat_lo, lat_hi, lng_lo, lng_hi = pdf.iloc[0]["params"]
        return Rect(rid, float(lat_lo), float(lat_hi),
                    float(lng_lo), float(lng_hi))
    pdf = pdf.sort_values("loop_idx")
    loops = [(int(row["depth"]), np.asarray(row["lats"], dtype=np.float64),
              np.asarray(row["lngs"], dtype=np.float64))
             for _, row in pdf.iterrows()]
    return Polygon(rid, loops)


def coverings_df_distributed(spark: SparkSession, regions,
                             max_cells: int = 64,
                             uniform_level: int | None = None,
                             max_level: int = 30) -> DataFrame:
    """Same output as pip_join.coverings_df, but the coverer runs in
    executors — one applyInPandas group per region."""
    rdf = regions_to_df(spark, regions)

    def cover_group(pdf: pd.DataFrame) -> pd.DataFrame:
        region = df_to_region(pdf)
        rows = covering_rows(region, max_cells=max_cells,
                             max_level=max_level,
                             uniform_level=uniform_level)
        return pd.DataFrame(
            rows, columns=[f.name for f in COVERINGS_SCHEMA.fields])

    return rdf.groupBy("region_id").applyInPandas(
        cover_group, COVERINGS_SCHEMA)
