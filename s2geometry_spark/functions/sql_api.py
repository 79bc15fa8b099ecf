"""SQL-registered function surface: the geometry kernels as named SQL
functions, so the engine is fully usable from ``spark.sql(...)`` /
``CREATE TEMP VIEW`` pipelines without touching the Python DataFrame
API (the form a SQL-first user of the reference library would expect).

    from s2geometry_spark.functions.sql_api import register_sql_functions
    register_sql_functions(spark)
    spark.sql('''
        SELECT url, s2_parent(s2_cell_id(lat, lng), 8) AS tile
        FROM pages
    ''')

All functions are the same Arrow-batched pandas UDFs the DataFrame
operators use (functions/geo.py) — registration adds names, not new
code paths — plus pure-SQL helper expressions for the hash-geocode
(those inline as strings because they are plain arithmetic).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from . import geo

#: name -> (udf, description)
SQL_FUNCTIONS = {
    "s2_cell_id": (geo.cell_id_udf,
                   "leaf (level-30) S2CellId from lat/lng degrees"),
    "s2_parent": (geo.cell_parent_udf,
                  "ancestor cell at a level (tile assignment)"),
    "s2_level": (geo.cell_level_udf, "level of a cell id"),
    "s2_token": (geo.cell_token_udf, "token string of a cell id"),
    "s2_order_key": (geo.cell_order_key_udf,
                     "signed-flip key whose int64 order == uint64 id "
                     "order (for BETWEEN range predicates)"),
    "s2_range_min_key": (geo.cell_range_min_key_udf,
                         "rangeMin in order-key space"),
    "s2_range_max_key": (geo.cell_range_max_key_udf,
                         "rangeMax in order-key space"),
    "s2_neighbors": (geo.all_neighbors_udf,
                     "deduped sorted 8-ring of same-level neighbors"),
}


def register_sql_functions(spark: SparkSession) -> list[str]:
    """Register every kernel under its s2_* SQL name; returns the
    registered names (idempotent — re-registration replaces)."""
    for name, (udf, _desc) in SQL_FUNCTIONS.items():
        spark.udf.register(name, udf)
    return sorted(SQL_FUNCTIONS)
