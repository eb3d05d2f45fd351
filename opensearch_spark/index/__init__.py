from opensearch_spark.index.codec import (  # noqa: F401
    BLOCK_SIZE,
    decode_block,
    make_blocks,
    varbyte_decode,
    varbyte_encode,
)
