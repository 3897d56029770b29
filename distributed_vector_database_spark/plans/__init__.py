from distributed_vector_database_spark.plans.inspect import (
    plan_text,
    pushed_filters,
    partition_filters,
    read_schema_columns,
    assert_filter_pushdown,
    assert_partition_pruned,
    assert_no_cross_join,
    wholestage_codegen_spans,
)

__all__ = [
    "plan_text",
    "pushed_filters",
    "partition_filters",
    "read_schema_columns",
    "assert_filter_pushdown",
    "assert_partition_pruned",
    "assert_no_cross_join",
    "wholestage_codegen_spans",
]
