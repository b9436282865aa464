"""filmdatawarehouse_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference `iistatiehh/FilmDataWareHouse` (a Kimball star-schema ETL over the
Sakila film-rental database; see SURVEY.md), re-expressed Spark-first:

- lazy DataFrame plans instead of eager pandas steps,
- Catalyst pushdown/pruning instead of hand-written SELECT lists,
- broadcast-hash joins + two-phase hash aggregation instead of pandas merge,
- idempotent partitioned parquet writes instead of blind JDBC append,
- plus an extended large-scale data-pipeline surface (fuzzy dedup, embedding
  similarity search, text analysis, multimodal plumbing, streaming windows)
  that the reference does not have but a 100 TB training-data pipeline needs.

No code is copied from the reference; reference file:line citations in
docstrings mark behavioral parity points only.
"""

from filmdatawarehouse_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
