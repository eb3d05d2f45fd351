from opensearch_spark.scoring.bm25 import BM25Params, bm25_idf, bm25_score  # noqa: F401
from opensearch_spark.scoring.smallfloat import (  # noqa: F401
    NORM_TABLE,
    byte4_to_int,
    int_to_byte4,
)
