"""Pages source: the engine's fact table (BASELINE.json::input_hint).

Production shape: an Iceberg table ``(url string, warc_ts timestamp,
html binary, text string, lang string)`` at 10^12 rows. The sandbox has
no Iceberg jar (SURVEY.md §7 hard-part 4), so locally we adapt the
driver's ``documents.parquet`` into exactly that shape, deterministically
(FIXTURES.md F1 adaptation rule):

    url     = source || '/' || doc_id
    warc_ts = timestamp '2025-01-01 00:00:00' + doc_id seconds
    html    = '<html><body>' || text || '</body></html>' as binary
    text    = text               (byte-identical passthrough — invariant)
    lang    = lang

Derived geo columns (north_star: "coordinates derived deterministically
by hashing url"):

    h       = xxhash64(url)      (Spark builtin, JVM codegen)
    lat,lng = exact portable arithmetic on h (functions/geo.py A36)
    cell_id = leaf S2CellId      (pandas UDF over numpy kernels)
    cell_l{K} = parent(cell_id, K)  (tile assignment, partition key)

Column-pruning note (SURVEY §4.2): ``html`` is built lazily via a
projection — queries that don't select it never materialize it, and at
scale the Parquet/Iceberg scan prunes the column entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import geo

DEFAULT_TILE_LEVELS = (4, 8, 12)


def load_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def documents_to_pages(docs: DataFrame, with_html: bool = False) -> DataFrame:
    """Adapt documents.parquet to the input_hint pages shape."""
    pages = docs.select(
        F.concat_ws("/", F.col("source"), F.col("doc_id").cast("string")).alias("url"),
        (F.to_timestamp(F.lit("2025-01-01 00:00:00"))
         + F.make_dt_interval(F.lit(0), F.lit(0), F.lit(0),
                              F.col("doc_id").cast("double"))).alias("warc_ts"),
        F.col("text"),
        F.col("lang"),
        F.col("doc_id"),
        F.col("n_chars"),
    )
    if with_html:
        pages = pages.withColumn(
            "html",
            F.encode(F.concat(F.lit("<html><body>"), F.col("text"),
                              F.lit("</body></html>")), "UTF-8"))
    return pages


def geocode_pages(pages: DataFrame, tile_levels=DEFAULT_TILE_LEVELS) -> DataFrame:
    """Derive h, lat, lng, leaf cell_id and tile columns.

    The hash→lat/lng math is pure SQL (codegen); only the Hilbert encode
    crosses to Python, as one Arrow-batched UDF over two double columns.
    """
    df = (pages
          .withColumn("h", F.xxhash64(F.col("url")))
          .withColumn("lat", geo.lat_from_hash(F.col("h")))
          .withColumn("lng", geo.lng_from_hash(F.col("h"))))
    df = df.withColumn("cell_id", geo.cell_id_udf(F.col("lat"), F.col("lng")))
    for lvl in tile_levels:
        df = df.withColumn(f"cell_l{lvl}", geo.parent_col(F.col("cell_id"), lvl))
    return df


def load_pages(spark: SparkSession, sf_dir: str,
               tile_levels=DEFAULT_TILE_LEVELS, with_html: bool = False) -> DataFrame:
    return geocode_pages(documents_to_pages(load_documents(spark, sf_dir),
                                            with_html=with_html),
                         tile_levels=tile_levels)
