"""Search-time derived fields (SearchSourceBuilder.java:118 derived /
DerivedFieldMapper.java:31-33 / DerivedFieldType.java:138,191): script-
computed fields defined per request and used in filter predicates,
sorts, and fetch — validated against pandas recomputation over the
corpus.
"""

import pandas as pd
import pytest


def _expected(corpus_pdf: pd.DataFrame) -> pd.DataFrame:
    out = corpus_pdf.copy()
    out["text_len"] = out["text"].str.len().astype("int64")
    return out


def test_derived_range_filter_matches_pandas(engine, corpus_pdf):
    exp = _expected(corpus_pdf)
    want = exp[(exp.text_len >= 80) & (exp.text_len < 160)]
    want_ids = set(zip(want.conv_id, want.turn_idx))
    rows = engine.search(
        {"range": {"text_len": {"gte": 80, "lt": 160}}},
        size=len(corpus_pdf),
        derived={"text_len": {"type": "long", "script": {"source": "length(text)"}}},
    ).collect()
    got_ids = {(r["conv_id"], r["turn_idx"]) for r in rows}
    assert got_ids == want_ids
    assert all(r["score"] == 1.0 for r in rows)


def test_derived_term_and_shorthand_expr(engine, corpus_pdf):
    # expression-shorthand spec (no type): string concat derived field
    exp = corpus_pdf.copy()
    exp["role_turn"] = exp["role"] + ":" + (exp.turn_idx % 3).astype(str)
    want_ids = set(
        zip(
            exp[exp.role_turn == "user:1"].conv_id,
            exp[exp.role_turn == "user:1"].turn_idx,
        )
    )
    rows = engine.search(
        {"term": {"role_turn": "user:1"}},
        size=len(corpus_pdf),
        derived={"role_turn": "concat(role, ':', pmod(turn_idx, 3))"},
    ).collect()
    assert {(r["conv_id"], r["turn_idx"]) for r in rows} == want_ids


def test_derived_sort_and_fetch(engine, corpus_pdf):
    # derived column as a sort key and a fetched source column in the
    # same request: longest matching docs first, text_len fetched
    rows = engine.search(
        {"match": {"text": "the"}},
        size=5,
        sort=[("text_len", "desc")],
        source_cols=["conv_id", "turn_idx", "text_len"],
        derived={"text_len": {"type": "long", "script": {"source": "length(text)"}}},
    ).collect()
    assert len(rows) == 5
    exp = _expected(corpus_pdf).set_index(["conv_id", "turn_idx"])
    lens = [r["text_len"] for r in rows]
    assert lens == sorted(lens, reverse=True)
    for r in rows:
        assert r["text_len"] == exp.loc[(r["conv_id"], r["turn_idx"]), "text_len"]


def test_derived_in_bool_filter_context(engine, corpus_pdf):
    # derived predicate rides the single fused docmap scan of the
    # bool filter context alongside a mapped-column predicate
    exp = _expected(corpus_pdf)
    want = exp[(exp.text_len >= 100) & (exp.role == "assistant")]
    rows = engine.search(
        {
            "bool": {
                "filter": [
                    {"range": {"text_len": {"gte": 100}}},
                    {"term": {"role": "assistant"}},
                ]
            }
        },
        size=len(corpus_pdf),
        derived={"text_len": "length(text)"},
    ).collect()
    assert len(rows) == len(want)


def test_derived_scope_is_per_request(engine):
    # after a derived request completes, the name is gone again
    engine.search(
        {"range": {"text_len": {"gte": 0}}},
        size=1,
        derived={"text_len": "length(text)"},
    ).collect()
    assert engine._derived == {}
    with pytest.raises(Exception):
        engine.search({"range": {"text_len": {"gte": 0}}}, size=1).collect()


def test_derived_validation(engine):
    with pytest.raises(ValueError, match="shadows"):
        with engine.derived_fields({"role": "upper(role)"}):
            pass
    with pytest.raises(ValueError, match="unsupported derived type"):
        with engine.derived_fields(
            {"x": {"type": "geo_point", "script": {"source": "1"}}}
        ):
            pass


def test_geo_shape_envelope_doc_field(engine):
    """geo_shape over an envelope STRUCT doc field (late r4): all four
    relations are exact interval algebra; disjoint complements
    intersects; non-envelope query shapes raise."""
    import pytest as _pt
    from pyspark.sql import functions as F

    box = ("named_struct('min_lat', CAST(dl AS DOUBLE) - 2.0, "
           "'max_lat', CAST(dl AS DOUBLE) + 2.0, "
           "'min_lon', CAST(turn_idx AS DOUBLE) - 3.0, "
           "'max_lon', CAST(turn_idx AS DOUBLE) + 3.0)")
    env = {"type": "envelope", "coordinates": [[0.0, 30.0], [10.0, 20.0]]}

    def run(relation, shape=env):
        return engine.search(
            {"geo_shape": {"box": {"shape": shape, "relation": relation}}},
            size=10000, derived={"box": box},
        ).collect()

    isect = run("intersects")
    disj = run("disjoint")
    within = run("within")
    contains = run("contains")
    total = engine.docmap().count()
    assert len(isect) + len(disj) == total
    ids = lambda rows: {(r["conv_id"], r["turn_idx"]) for r in rows}
    assert ids(within) <= ids(isect)
    assert ids(contains) <= ids(isect)
    # hand-check semantics on the docmap
    dm = engine.docmap().select("conv_id", "turn_idx", "dl").collect()
    exp_isect = {
        (r["conv_id"], r["turn_idx"]) for r in dm
        if r["dl"] - 2 <= 30 and r["dl"] + 2 >= 20
        and r["turn_idx"] - 3 <= 10 and r["turn_idx"] + 3 >= 0
    }
    assert ids(isect) == exp_isect
    with _pt.raises(NotImplementedError):
        run("intersects", {"type": "polygon",
                           "coordinates": [[[0, 0], [1, 0], [1, 1]]]})


def test_geo_shape_indexed_shape_lookup(engine):
    """indexed_shape: the query envelope is fetched from another doc's
    (derived) struct column — one point-read, then identical to the
    inline envelope query."""
    import pytest as _pt

    box = ("named_struct('min_lat', CAST(dl AS DOUBLE) - 2.0, "
           "'max_lat', CAST(dl AS DOUBLE) + 2.0, "
           "'min_lon', CAST(turn_idx AS DOUBLE) - 3.0, "
           "'max_lon', CAST(turn_idx AS DOUBLE) + 3.0)")
    ref = engine.docmap().select("conv_id", "turn_idx", "dl").head()
    looked = engine.search(
        {"geo_shape": {"box": {
            "indexed_shape": {
                "id": {"conv_id": ref["conv_id"], "turn_idx": ref["turn_idx"]},
                "path": "box"},
            "relation": "intersects"}}},
        size=10000, derived={"box": box},
    ).collect()
    inline = engine.search(
        {"geo_shape": {"box": {
            "shape": {"type": "envelope",
                      "coordinates": [
                          [ref["turn_idx"] - 3.0, ref["dl"] + 2.0],
                          [ref["turn_idx"] + 3.0, ref["dl"] - 2.0]]},
            "relation": "intersects"}}},
        size=10000, derived={"box": box},
    ).collect()
    key = lambda rows: sorted((r["conv_id"], r["turn_idx"]) for r in rows)
    assert key(looked) == key(inline) and len(looked) > 0
    with _pt.raises(ValueError):
        engine.search(
            {"geo_shape": {"box": {
                "indexed_shape": {"id": {"conv_id": "no-such", "turn_idx": 0},
                                  "path": "box"}}}},
            size=5, derived={"box": box},
        ).collect()


def test_geo_shape_envelope_doc_dateline(engine):
    """r5: a query envelope with left > right crosses the antimeridian
    and evaluates as the two windows [left,180] | [-180,right]
    (intersects/within OR across windows, contains AND) — the
    GeoBoundingBoxQueryBuilder dateline split applied to shape docs."""
    box = ("named_struct('min_lat', CAST(dl AS DOUBLE) - 2.0, "
           "'max_lat', CAST(dl AS DOUBLE) + 2.0, "
           "'min_lon', 160.0 + CAST(turn_idx AS DOUBLE) * 4.0, "
           "'max_lon', 166.0 + CAST(turn_idx AS DOUBLE) * 4.0)")
    # crosses: lon [170, -170] wraps; lat wide open
    env = {"type": "envelope", "coordinates": [[170.0, 90.0], [-170.0, -90.0]]}

    def run(relation):
        return engine.search(
            {"geo_shape": {"box": {"shape": env, "relation": relation}}},
            size=10000, derived={"box": box},
        ).collect()

    isect, disj, within = run("intersects"), run("disjoint"), run("within")
    total = engine.docmap().count()
    assert len(isect) + len(disj) == total
    dm = engine.docmap().select("conv_id", "turn_idx").collect()
    exp_isect = set()
    exp_within = set()
    for r in dm:
        lo, hi = 160.0 + r["turn_idx"] * 4.0, 166.0 + r["turn_idx"] * 4.0
        # window algebra vs the wrapped query [170,180] U [-180,-170]
        hit = (lo <= 180.0 and hi >= 170.0) or (lo <= -170.0 and hi >= -180.0)
        win = (lo >= 170.0 and hi <= 180.0) or (lo >= -180.0 and hi <= -170.0)
        if hit:
            exp_isect.add((r["conv_id"], r["turn_idx"]))
        if win:
            exp_within.add((r["conv_id"], r["turn_idx"]))
    ids = lambda rows: {(r["conv_id"], r["turn_idx"]) for r in rows}
    assert ids(isect) == exp_isect and exp_isect
    assert ids(within) == exp_within
