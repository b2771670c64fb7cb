"""geo_shape over POLYGON-valued doc fields (executor._polygon_doc_pred):
fixed hand-derived geometry cases + a lattice sweep cross-checked by
independent L1 diamond algebra (planar diamonds reduce relations to
Manhattan-distance inequalities)."""

import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def poly_engine(spark, tmp_path_factory):
    from opensearch_spark.index.builder import IndexConfig, build_index
    from opensearch_spark.index.reader import InvertedIndex
    from opensearch_spark.query.executor import SearchEngine

    # rings as (lat, lon) vertex lists, open
    rings = {
        0: [(1, 1), (1, 9), (9, 9), (9, 1)],          # inside query env
        1: [(20, 20), (20, 30), (30, 30), (30, 20)],  # disjoint
        2: [(-20, -20), (-20, 40), (40, 40), (40, -20)],  # contains query
        3: [(-30, 4), (-30, 6), (50, 6), (50, 4)],    # crosses (edges only)
        4: [(0, 15), (0, 20), (10, 20), (10, 15)],    # touches right edge
    }
    rows = [
        (i, "x", [{"lat": float(la), "lon": float(lo)} for la, lo in ring])
        for i, ring in rings.items()
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, poly array<struct<lat:double,lon:double>>"
    )
    d = str(tmp_path_factory.mktemp("polyidx") / "idx")
    build_index(
        spark, df, d,
        IndexConfig(n_segments=1, id_cols=("doc_id",), dictionary_partitions=1),
    )
    return SearchEngine(InvertedIndex(spark, d))


def _ids(eng, shape, relation):
    rows = eng.search(
        {"bool": {"filter": [
            {"geo_shape": {"poly": {"shape": shape, "relation": relation}}}
        ]}},
        size=100,
    ).collect()
    return sorted(r["doc_id"] for r in rows)


# query envelope: lon 0..15, lat 0..15
_ENV = {"type": "envelope", "coordinates": [[0.0, 15.0], [15.0, 0.0]]}


def test_fixed_envelope_relations(poly_engine):
    assert _ids(poly_engine, _ENV, "intersects") == [0, 2, 3, 4]
    assert _ids(poly_engine, _ENV, "within") == [0]
    assert _ids(poly_engine, _ENV, "contains") == [2]
    assert _ids(poly_engine, _ENV, "disjoint") == [1]


def test_fixed_polygon_query(poly_engine):
    # same region expressed as a polygon ring (GeoJSON [lon, lat])
    poly = {"type": "polygon", "coordinates": [
        [[0.0, 0.0], [15.0, 0.0], [15.0, 15.0], [0.0, 15.0], [0.0, 0.0]]
    ]}
    assert _ids(poly_engine, poly, "intersects") == [0, 2, 3, 4]
    assert _ids(poly_engine, poly, "within") == [0]
    assert _ids(poly_engine, poly, "contains") == [2]


def test_fixed_point_and_multipolygon(poly_engine):
    pt = {"type": "point", "coordinates": [5.0, 5.0]}  # lon, lat
    assert _ids(poly_engine, pt, "contains") == [0, 2, 3]
    assert _ids(poly_engine, pt, "intersects") == [0, 2, 3]
    assert _ids(poly_engine, pt, "disjoint") == [1, 4]
    mp = {"type": "multipolygon", "coordinates": [
        [[[0.0, 0.0], [15.0, 0.0], [15.0, 15.0], [0.0, 15.0]]],
        [[[22.0, 22.0], [28.0, 22.0], [28.0, 28.0], [22.0, 28.0]]],
    ]}
    # second member overlaps doc 1 -> union picks it up
    assert _ids(poly_engine, mp, "intersects") == [0, 1, 2, 3, 4]
    # contains = doc must contain EVERY member: doc 2 spans -20..40 on
    # both axes so it holds member 1 (0..15) AND member 2 (22..28);
    # doc 1 (20..30) holds only member 2 -> excluded
    assert _ids(poly_engine, mp, "contains") == [2]


def test_point_doc_path_still_works(poly_engine):
    # the polygon detection must not hijack non-array fields: a shape
    # query on an absent/point field behaves as before (here: raises
    # cleanly on the missing lat/lon pair rather than misrouting)
    with pytest.raises(Exception):
        _ids(poly_engine, _ENV.copy() | {}, "intersects") if False else (
            poly_engine.search(
                {"geo_shape": {"nope": {"shape": _ENV, "relation": "intersects"}}},
                size=1,
            ).collect()
        )


SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata absent")
def test_diamond_lattice_vs_l1_algebra(spark):
    """Doc diamonds (center = the derived lat/lon, L1 radius
    h = 1 + doc_id % 40) against a query diamond: every relation
    reduces EXACTLY to Manhattan-distance inequalities, independently
    recomputed in pandas — the generic raycast/segment kernels must
    reproduce them doc-for-doc (fixture designed tie-free: 3-decimal
    query offsets never equal 2-decimal doc lattice sums)."""
    from opensearch_spark.docs_index import docset, documents_engine

    eng = documents_engine(spark, SF_DIR)
    poly_expr = (
        "array("
        "named_struct('lat', lat + (1.0 + doc_id % 40), 'lon', lon), "
        "named_struct('lat', lat, 'lon', lon + (1.0 + doc_id % 40)), "
        "named_struct('lat', lat - (1.0 + doc_id % 40), 'lon', lon), "
        "named_struct('lat', lat, 'lon', lon - (1.0 + doc_id % 40)))"
    )
    qa, qb, qh = 10.005, 20.005, 20.003
    qring = [[qb, qa + qh], [qb + qh, qa], [qb, qa - qh], [qb - qh, qa]]
    qshape = {"type": "polygon", "coordinates": [qring]}
    got = {
        rel: sorted(
            r["doc_id"]
            for r in docset(
                eng,
                {"geo_shape": {"dpoly": {"shape": qshape, "relation": rel}}},
                derived={"dpoly": poly_expr},
            ).select("doc_id").collect()
        )
        for rel in ("intersects", "within", "disjoint", "contains")
    }
    pdf = eng.docmap().select("doc_id", "lat", "lon").toPandas()
    l1 = (pdf.lat - qa).abs() + (pdf.lon - qb).abs()
    h = 1.0 + (pdf.doc_id % 40)
    exp_int = sorted(pdf.doc_id[l1 <= qh + h])
    exp_win = sorted(pdf.doc_id[l1 <= qh - h])
    exp_dis = sorted(pdf.doc_id[l1 > qh + h])
    exp_con = sorted(pdf.doc_id[l1 <= h - qh])
    assert got["intersects"] == exp_int
    assert got["within"] == exp_win
    assert got["disjoint"] == exp_dis
    assert got["contains"] == exp_con
    assert exp_int and exp_win and exp_dis  # non-vacuous three ways
