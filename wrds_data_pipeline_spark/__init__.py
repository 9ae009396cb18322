"""wrds_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference repo ``eamonbracht/wrds_data_pipeline``
(a WRDS financial-data pipeline: universe building via interval joins,
TAQ quote resampling, windowed correlation matrices, graph feature
extraction), built Spark-first:

- DataFrame / SQL API on top of Catalyst; no RDDs, no Python UDFs in
  the hot path.
- Per-day remote tables become one date-partitioned table (partition
  pruning replaces table-name templating).
- Driver loops over days/windows/tickers become partitioning
  dimensions of a single distributed plan.
- Beyond the reference surface: large-scale training-data operators
  (dedup, similarity search, text analysis, multimodal plumbing) and
  a Structured Streaming variant of the resample path.

See SURVEY.md in the repo root for the operator-by-operator blueprint
with reference citations.
"""

from wrds_data_pipeline_spark.session import get_spark

__all__ = ["get_spark"]
