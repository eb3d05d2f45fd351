from opensearch_spark.analysis.analyzer import (  # noqa: F401
    ANALYZERS,
    analyze_udf,
    tokenize,
)
