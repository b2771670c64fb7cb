"""Mapper-plugin analogs: ``mapper-size`` and ``mapper-murmur3``.

Reference:
- ``plugins/mapper-size/.../SizeFieldMapper.java:48,101``: when enabled,
  every document gets a ``_size`` metadata field holding the byte length
  of its ``_source`` — queryable/aggregatable like any integer field.
- ``plugins/mapper-murmur3/.../Murmur3FieldMapper.java:62,157``: a
  ``murmur3`` sub-field stores ``MurmurHash3.hash128(value).h1`` (the
  first 64 bits) as doc values, so ``cardinality`` aggregations over
  long strings hash tiny fixed-width longs instead of the raw bytes.

Spark mapping: both are single ``withColumn`` projections — pure
Catalyst, whole-stage-codegen'd, zero shuffle.  The hash function is
``xxhash64`` rather than murmur3-128/h1 (Spark's JVM-side 64-bit hash;
the same documented substitution the index builder makes for routing —
any fixed 64-bit hash preserves the mapper's contract that equal values
collide and unequal values almost surely don't).  ``_size`` measures
the UTF-8 byte length of the document's source payload columns (our
``_source`` is the row itself, SURVEY.md §1.1).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_size_field(
    df: DataFrame,
    source_cols: Optional[Sequence[str]] = None,
    out: str = "_size",
) -> DataFrame:
    """``mapper-size`` analog: append ``_size`` = UTF-8 byte length of
    the doc's source payload (``SizeFieldMapper.java:101`` measures the
    raw ``_source`` bytes; here the source is the row, so the size is
    the sum of its string columns' byte lengths — deterministic and
    schema-stable where JSON re-serialization would not be)."""
    cols = list(source_cols) if source_cols else [
        f.name for f in df.schema.fields if f.dataType.typeName() == "string"
    ]
    if not cols:
        raise ValueError("no string source columns to size")
    size = None
    for c in cols:
        b = F.coalesce(F.octet_length(F.col(c)), F.lit(0)).cast("long")
        size = b if size is None else size + b
    return df.withColumn(out, size)


def with_token_count_field(
    df: DataFrame, col: str, out: Optional[str] = None, analyzer="standard"
) -> DataFrame:
    """``token_count`` field type (mapper-extras
    ``TokenCountFieldMapper.java:53``): a sub-field holding the number
    of analyzed tokens of the text, computed with the SAME analysis
    chain the index would use — an Arrow-batched pandas UDF, one pass,
    no shuffle.  NULL text counts NULL (the reference leaves the field
    absent)."""
    from pyspark.sql.functions import pandas_udf

    from opensearch_spark.analysis.chain import Analyzer

    an = Analyzer.from_spec(analyzer)
    # underscore, not the reference's dotted sub-field name: a dot in a
    # Spark column name reads as struct-field access in F.col()/select
    out = out or f"{col}_token_count"

    @pandas_udf("int")
    def _count(s):
        return s.map(lambda x: None if x is None else len(an(x)[0]))

    return df.withColumn(out, _count(F.col(col)))


def with_murmur3_field(df: DataFrame, col: str, out: Optional[str] = None) -> DataFrame:
    """``mapper-murmur3`` analog: append ``<col>_mm3`` = 64-bit hash of
    the value (NULL stays NULL, like the reference skipping null
    values), for cheap cardinality over long strings.  (Underscore, not
    the reference's dotted sub-field: dots in Spark column names read
    as struct-field access.)"""
    out = out or f"{col}_mm3"
    return df.withColumn(
        out,
        F.when(F.col(col).isNull(), F.lit(None).cast("long")).otherwise(
            F.xxhash64(F.col(col))
        ),
    )
