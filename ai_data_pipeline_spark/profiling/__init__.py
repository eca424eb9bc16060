from ai_data_pipeline_spark.profiling.profiler import profile_table  # noqa: F401
from ai_data_pipeline_spark.profiling.oracle import profile_oracle_sql  # noqa: F401
