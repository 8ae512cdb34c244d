"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship interleaved-document spatial pipeline
on sf0.001; ``queries()``/``oracle_sql()`` expose every implemented
operator from SURVEY.md §2 (plus the training-data operators) with DuckDB
oracles wherever SQL-expressible.  Implementations live in
``geomatics_geotk_spark.queries``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from geomatics_geotk_spark import queries as _q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: interleaved docs (text+media+geo spans) → decode geo span
    → Z-order tile assignment → broadcast point-in-polygon join against
    fixture + grid zones → (doc_id, zone_id, cell_id) with the span
    sequence carried through untouched (span-sequence invariant)."""
    from pyspark.sql import functions as F

    from geomatics_geotk_spark.operators import spatial_join
    from geomatics_geotk_spark.sources.documents import zones_table

    sf_dir = "/root/testdata/sf0.001"
    inter = _q.build_interleaved(spark, sf_dir)
    decoded = spatial_join.decode_geo_spans(inter)
    tiled = spatial_join.tile_assign(decoded, _q.RES)
    joined = spatial_join.spatial_join(
        tiled, zones_table(spark, grid=8), res=_q.RES, strategy="broadcast"
    )
    return joined.select(
        "doc_id", "zone_id", "cell_id", F.to_json("spans").alias("spans_json")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_q.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_q.ORACLES)
