from opensearch_spark.analysis.analyzer import (  # noqa: F401
    ANALYZERS,
    analyze_join_udf,
    termfreq_udf,
    analyze_udf,
    tokens_col,
    tokenize,
)
