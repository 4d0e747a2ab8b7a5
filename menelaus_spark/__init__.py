"""menelaus_spark — a from-scratch PySpark-native schema/constraint
validation and drift-monitoring engine with the capabilities of
mitre/menelaus (reference, read-only at /root/reference), re-expressed
Spark-first.

Architecture (SURVEY.md §7): heavy statistics are distributed DataFrame
aggregations (histograms, frequencies, min/max, quantile sketches,
joins); sequential drift decisions (epsilon/beta state machines, CUSUM,
ADWIN, ...) run on tiny collected summaries on the driver or inside
per-group ``applyInPandas``. Verdicts land in a per-(partition, check)
verdict table plus a violation-rows table; runs are resumable from a
checkpoint manifest with per-partition lineage.
"""

__version__ = "0.1.0"

from menelaus_spark.session import get_spark  # noqa: F401
