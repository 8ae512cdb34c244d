"""Plan inspection + run metrics.

Helpers to assert scale-hygiene properties of Catalyst plans (filters
pushed to the parquet scan, broadcast joins where expected) and to collect
per-stage row/latency metrics for the lineage table.
"""

from __future__ import annotations

import re
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")  # noqa: SLF001


def plan_has_broadcast(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def plan_has_pushed_filters(df: DataFrame) -> bool:
    plan = formatted_plan(df)
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    return bool(m and m.group(1).strip())


def scan_read_schema(df: DataFrame) -> list[str]:
    """Column names reaching the parquet scan (pruning check)."""
    plan = formatted_plan(df)
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    if not m:
        return []
    return [c.split(":")[0] for c in m.group(1).split(",") if c]


@dataclass
class StageMetrics:
    """Per-stage row-count + latency log — the metrics half of the
    lineage requirement (sources.sink writes the per-partition half)."""

    stages: list[dict] = field(default_factory=list)

    def record(self, name: str, df: DataFrame) -> DataFrame:
        t0 = time.time()
        rows = df.count()
        self.stages.append({"stage": name, "rows": rows, "seconds": time.time() - t0})
        return df

    def as_dataframe(self, spark):
        return spark.createDataFrame(
            [(s["stage"], s["rows"], s["seconds"]) for s in self.stages],
            "stage string, rows long, seconds double",
        )
