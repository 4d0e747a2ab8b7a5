"""Verdict + violation row model.

The reference's universal output is a detector state machine
(``drift_state`` in {"drift","warning",None} plus counters,
/root/reference/menelaus/detector.py:126-170). Our engine's universal
output is data: one verdict row per (partition, check) and a violation
table of offending rows — "per-partition pass/fail verdict plus
violation rows" per the north rule.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

PASS, WARNING, DRIFT, FAIL = "pass", "warning", "drift", "fail"

VERDICT_SCHEMA = T.StructType(
    [
        T.StructField("partition_key", T.StringType(), False),
        T.StructField("check_name", T.StringType(), False),
        T.StructField("statistic", T.DoubleType(), True),
        T.StructField("threshold", T.DoubleType(), True),
        T.StructField("state", T.StringType(), False),
        T.StructField("n_rows", T.LongType(), True),
        T.StructField("details", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

VIOLATION_SCHEMA = T.StructType(
    [
        T.StructField("partition_key", T.StringType(), False),
        T.StructField("check_name", T.StringType(), False),
        T.StructField("row_key", T.StringType(), True),
        T.StructField("reason", T.StringType(), False),
        T.StructField("details", T.MapType(T.StringType(), T.StringType()), True),
    ]
)


@dataclass
class Verdict:
    partition_key: str
    check_name: str
    state: str
    statistic: float | None = None
    threshold: float | None = None
    n_rows: int | None = None
    details: dict[str, str] = field(default_factory=dict)

    def as_row(self) -> dict:
        return {
            "partition_key": str(self.partition_key),
            "check_name": self.check_name,
            "statistic": None if self.statistic is None else float(self.statistic),
            "threshold": None if self.threshold is None else float(self.threshold),
            "state": self.state,
            "n_rows": None if self.n_rows is None else int(self.n_rows),
            "details": {k: str(v) for k, v in self.details.items()},
        }


def verdicts_df(spark: SparkSession, verdicts: list[Verdict]) -> DataFrame:
    return spark.createDataFrame([v.as_row() for v in verdicts], schema=VERDICT_SCHEMA)


def empty_violations(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([], schema=VIOLATION_SCHEMA)
