"""`knn` query clause (dsl.Knn / executor knn branch) — exact
vector top-k over docmap embedding columns, numpy brute force as the
oracle.  Beyond-reference surface: the k-NN plugin's KNNQueryBuilder
request shape over the ops/similarity contract."""

import math

import numpy as np
import pytest

from opensearch_spark.index.builder import IndexConfig, build_index
from opensearch_spark.index.reader import InvertedIndex
from opensearch_spark.query import dsl as Q
from opensearch_spark.query.executor import SearchEngine

N, DIM = 40, 8


def _vec(i):
    rng = np.random.RandomState(i)
    return rng.rand(DIM).astype("float32")


@pytest.fixture(scope="module")
def knn_engine(spark, tmp_path_factory):
    rows = [
        (
            f"c{i:03d}",
            0,
            "user",
            f"message number {i}",
            "web" if i % 3 == 0 else "chat",
            [float(x) for x in _vec(i)],
        )
        for i in range(N)
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string,"
        " source string, embedding array<float>",
    )
    out = str(tmp_path_factory.mktemp("knnidx"))
    build_index(spark, df, out, IndexConfig(n_segments=4))
    return SearchEngine(InvertedIndex(spark, out))


def _gold(space, qv, keep=None):
    scores = []
    for i in range(N):
        if keep is not None and not keep(i):
            continue
        v = _vec(i).astype("float64")
        if space == "cosinesimil":
            s = float(v @ qv / (np.linalg.norm(v) * np.linalg.norm(qv)))
        elif space == "l2":
            s = 1.0 / (1.0 + float(((v - qv) ** 2).sum()))
        else:
            s = float(v @ qv)
        scores.append((f"c{i:03d}", s))
    scores.sort(key=lambda t: (-t[1], t[0]))
    return scores


@pytest.mark.parametrize("space", ["cosinesimil", "l2", "innerproduct"])
def test_knn_topk_matches_numpy(knn_engine, space):
    qv = _vec(999).astype("float64")
    got = knn_engine.search(
        {
            "knn": {
                "embedding": {
                    "vector": [float(x) for x in qv],
                    "k": 7,
                    "space_type": space,
                }
            }
        },
        size=7,
    ).collect()
    gold = _gold(space, qv)[:7]
    assert [r["conv_id"] for r in got] == [g[0] for g in gold]
    for r, g in zip(got, gold):
        assert math.isclose(r["score"], g[1], rel_tol=1e-5), (r, g)


def test_knn_filtered(knn_engine):
    qv = _vec(777).astype("float64")
    got = knn_engine.search(
        {
            "knn": {
                "embedding": {
                    "vector": [float(x) for x in qv],
                    "k": 5,
                    "filter": {"term": {"source": "web"}},
                }
            }
        },
        size=5,
    ).collect()
    gold = _gold("cosinesimil", qv, keep=lambda i: i % 3 == 0)[:5]
    assert [r["conv_id"] for r in got] == [g[0] for g in gold]


def test_knn_boost_and_k_cap(knn_engine):
    qv = _vec(5).astype("float64")
    got = knn_engine.search(
        {
            "knn": {
                "embedding": {
                    "vector": [float(x) for x in qv],
                    "k": 3,
                    "boost": 2.0,
                }
            }
        },
        size=10,
    ).collect()
    assert len(got) == 3  # k caps the match set even when size is larger
    gold = _gold("cosinesimil", qv)[:3]
    for r, g in zip(got, gold):
        assert math.isclose(r["score"], 2.0 * g[1], rel_tol=1e-5)


def test_knn_parse_roundtrip():
    q = Q.from_dict(
        {
            "knn": {
                "embedding": {
                    "vector": [1.0, 0.0],
                    "k": 4,
                    "filter": {"term": {"source": "web"}},
                    "space_type": "l2",
                }
            }
        }
    )
    assert isinstance(q, Q.Knn)
    assert q.k == 4 and q.space_type == "l2"
    assert isinstance(q.filter, Q.Term)


def test_knn_plan_jvm_topk(knn_engine):
    """Plan gate: the knn scorer stays JVM-side (no Python eval node —
    zip_with/aggregate compile to Catalyst higher-order functions) and
    the k-bound ordering collapses to TakeOrderedAndProject, not a
    global sort."""
    df = knn_engine._score(
        Q.Knn("embedding", vector=[float(x) for x in _vec(1)], k=5)
    )
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "TakeOrderedAndProject" in plan


def test_knn_in_search_body(knn_engine):
    """The `_search` request body routes knn through from_dict like any
    other query kind."""
    from opensearch_spark.restapi import search_request

    qv = [float(x) for x in _vec(999)]
    resp = search_request(
        knn_engine,
        {"query": {"knn": {"embedding": {"vector": qv, "k": 3}}},
         "size": 3, "_source": ["conv_id"]},
    )
    hits = resp["hits"]["hits"]
    gold = _gold("cosinesimil", np.asarray(qv, dtype="float64"))[:3]
    assert [h["_source"]["conv_id"] for h in hits] == [g[0] for g in gold]
    assert resp["hits"]["total"]["value"] == 3
