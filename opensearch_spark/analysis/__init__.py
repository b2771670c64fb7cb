"""Text analysis: standard analyzer + SmallFloat norm quantization."""

from opensearch_spark.analysis.analyzer import (  # noqa: F401
    ENGLISH_STOP_WORDS,
    MAX_TOKEN_LENGTH,
    make_tokenize_udf,
    resolve_stopwords,
    tokenize,
    tokenize_series,
)
from opensearch_spark.analysis.smallfloat import (  # noqa: F401
    DECODE_TABLE,
    byte4_to_int,
    int_to_byte4,
    quantize_len,
)
