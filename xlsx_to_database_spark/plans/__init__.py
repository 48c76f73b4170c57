from xlsx_to_database_spark.plans.inspect import (
    explain_str,
    has_broadcast_hash_join,
    has_pushed_filters,
    pruned_read_schema,
    wholestage_codegen_spans,
)

__all__ = [
    "explain_str",
    "has_broadcast_hash_join",
    "has_pushed_filters",
    "pruned_read_schema",
    "wholestage_codegen_spans",
]
