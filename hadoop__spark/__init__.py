"""hadoop__spark — a PySpark-native analytics engine.

A from-scratch rebuild of the capabilities of the reference repo
``dongbin86/hadoop-`` (a HiveQL column-level lineage analyzer; see
/root/reference/README.md), re-expressed Spark-first:

* **Exec plane** — every HiveQL query shape the reference understands
  (SURVEY.md §2) runs natively through Spark SQL / the DataFrame API,
  letting Catalyst pick physical strategies (broadcast joins, pushdown,
  AQE) instead of hand-scheduling anything.
* **Analysis plane** — the reference's actual product: given a HiveQL
  script, extract input/output tables, column-level lineage, and
  condition sets.  Implemented over Spark's own parsed logical plans
  (``hadoop__spark.lineage``) instead of hand-walking a raw ANTLR AST
  (reference: README.md:100-844).
* **Pipeline plane** — large-scale training-data operators the original
  never had: deduplication (exact / MinHash-LSH / SimHash / n-gram
  Jaccard / embedding cosine), ANN similarity search, text analysis,
  and multimodal binary-column plumbing (``hadoop__spark.operators``).

Everything is designed for a multi-executor cluster at ~100 TB scale
(partition discipline, broadcast hints, no driver-side collects in
operators) while being testable on ``local[N]``.
"""

from hadoop__spark.session import get_spark, load_tables, register_views

__all__ = ["get_spark", "load_tables", "register_views"]
__version__ = "0.1.0"
