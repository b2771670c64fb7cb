import os
import shutil

import numpy as np
import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

N_CONVS = 300  # ~2k turns: big enough for real df/tf variety, fast to build


@pytest.fixture(scope="session")
def spark():
    from opensearch_spark.session import get_spark

    s = get_spark("pytest", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def corpus_pdf():
    from opensearch_spark.transcripts import generate_pandas

    return generate_pandas(np.arange(N_CONVS))


@pytest.fixture(scope="session")
def oracle(corpus_pdf):
    from opensearch_spark.oracle import OracleIndex

    return OracleIndex(corpus_pdf.to_dict("records"))


@pytest.fixture(scope="session")
def index_dir(spark, tmp_path_factory):
    from opensearch_spark.index.builder import IndexConfig, build_index
    from opensearch_spark.transcripts import generate

    d = str(tmp_path_factory.mktemp("idx") / "main")
    docs = generate(spark, N_CONVS, partitions=4)
    build_index(spark, docs, d, IndexConfig(n_segments=8))
    return d


@pytest.fixture(scope="session")
def engine(spark, index_dir):
    from opensearch_spark.index.reader import InvertedIndex
    from opensearch_spark.query.executor import SearchEngine

    return SearchEngine(InvertedIndex(spark, index_dir))


def topk_ids_scores(rows):
    return [((r["conv_id"], r["turn_idx"]), r["score"]) for r in rows]


def assert_rank_identical(rows, gold, rel=1e-6):
    got = topk_ids_scores(rows)
    assert [g[0] for g in got] == [g[0] for g in gold], (
        f"rank mismatch:\n engine={[g[0] for g in got]}\n oracle={[g[0] for g in gold]}"
    )
    for (gid, gs), (oid, os_) in zip(got, gold):
        assert abs(gs - os_) <= rel * max(1.0, abs(os_)), (gid, gs, os_)
