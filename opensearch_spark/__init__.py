"""opensearch_spark — a PySpark-native full-text indexing + BM25 query engine.

A from-scratch rebuild of the query/data-processing capabilities of the
reference OpenSearch engine (soosinha/OpenSearch, surveyed in SURVEY.md),
re-expressed Spark-first:

- documents live in parquet/Iceberg tables (one row per transcript turn),
- the inverted index is a set of derived tables (postings blocks, term
  dictionary, doc norms, corpus stats) built by a distributed, resumable
  Spark job (`opensearch_spark.index.builder`),
- queries are declared as a small DSL (`opensearch_spark.query.dsl`) and
  compiled to DataFrame plans (`opensearch_spark.query.executor`) that
  Catalyst optimizes (predicate pushdown into the postings scan, broadcast
  of the tiny per-query term stats, distributed top-k),
- scoring is Okapi BM25 with Lucene-compatible quantized norms
  (`opensearch_spark.analysis.smallfloat`, k1=1.2, b=0.75).

Everything here derives from public knowledge only: the Apache Spark API,
the public Lucene/OpenSearch source (cited file:line in docstrings), and
published IR literature.
"""

__version__ = "0.1.0"
