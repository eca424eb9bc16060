"""Physical-plan inspection utilities (SURVEY.md §4: we add no custom
Catalyst rules — instead we *verify* the plans Catalyst produces)."""

from ai_data_pipeline_spark.plans.inspect import (
    assert_hash_join_only,
    codegen_plan,
    executed_plan,
    formatted_plan,
)

__all__ = [
    "assert_hash_join_only",
    "codegen_plan",
    "executed_plan",
    "formatted_plan",
]
