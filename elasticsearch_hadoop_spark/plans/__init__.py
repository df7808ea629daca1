"""Plan-level tooling: `.explain("formatted")` parsing and assertions."""

from elasticsearch_hadoop_spark.plans.inspect import (  # noqa: F401
    complex_output_cols,
    count_nodes,
    formatted_plan,
    pushed_filters,
    read_schema_columns,
)
