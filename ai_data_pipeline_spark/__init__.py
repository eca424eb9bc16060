"""ai_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference repo
saipuli3872/ai-data-pipeline (a pandas column-profiling / semantic-type
classification engine) as an idiomatic Apache Spark engine, extended with
the large-scale training-data operators (dedup, similarity search,
multimodal columns, text analysis) and designed for 100 TB scale:

- Profiling is ONE wide ``df.agg`` pass per table (partial aggregation +
  whole-stage codegen; no per-column scans, no driver-side data loops).
- All semantic decisions are integer-exact SQL expressions so the same
  logic is reproducible bit-for-bit in any ANSI engine (DuckDB oracle).
- Joins broadcast small dimensions; shuffles are keyed and AQE-managed.
"""

__version__ = "0.1.0"

from ai_data_pipeline_spark.session import get_spark  # noqa: F401
from ai_data_pipeline_spark.catalog import TABLES, load_table  # noqa: F401
