"""Date-math resolution (RangeQueryBuilder.java / DateMathParser.java
semantics subset) + range-query integration."""

from __future__ import annotations

import datetime as dt

import pytest

from opensearch_spark.query import datemath as dm

NOW = dt.datetime(2026, 8, 17, 10, 30, 45, 123000)


def test_now_arithmetic():
    assert dm.resolve("now", NOW) == NOW
    assert dm.resolve("now-7d", NOW) == NOW - dt.timedelta(days=7)
    assert dm.resolve("now+90m", NOW) == NOW + dt.timedelta(minutes=90)
    assert dm.resolve("now-1w", NOW) == NOW - dt.timedelta(days=7)
    assert dm.resolve("now+1M", NOW) == dt.datetime(2026, 9, 17, 10, 30, 45, 123000)
    assert dm.resolve("now-1y", NOW) == NOW.replace(year=2025)


def test_rounding_side_dependence():
    # lower bound (round_up=False): start of day
    assert dm.resolve("now/d", NOW, round_up=False) == dt.datetime(2026, 8, 17)
    # upper bound (round_up=True): last millisecond of day
    assert dm.resolve("now/d", NOW, round_up=True) == dt.datetime(
        2026, 8, 17, 23, 59, 59, 999000
    )
    assert dm.resolve("now-7d/d", NOW, round_up=False) == dt.datetime(2026, 8, 10)
    # month rounding
    assert dm.resolve("now/M", NOW, round_up=False) == dt.datetime(2026, 8, 1)
    assert dm.resolve("now/M", NOW, round_up=True) == dt.datetime(
        2026, 8, 31, 23, 59, 59, 999000
    )


def test_anchor_form():
    assert dm.resolve("2024-01-15||+1M", NOW) == dt.datetime(2024, 2, 15)
    assert dm.resolve("2024-01-31||+1M", NOW) == dt.datetime(2024, 2, 29)  # clamp, leap
    assert dm.resolve("2024-01-15||/M", NOW) == dt.datetime(2024, 1, 1)
    assert dm.resolve("2024||+2y-3d", NOW) == dt.datetime(2025, 12, 29)


def test_is_date_math():
    assert dm.is_date_math("now-7d")
    assert dm.is_date_math("2024-01-01||/d")
    assert not dm.is_date_math("2024-01-01")
    assert not dm.is_date_math(7)


def test_range_query_with_date_math(engine, corpus_pdf):
    """Range with now-anchored math matches the equivalent explicit
    bound (the corpus ts values are all in the past, so now-anchored
    upper bounds include everything and tight lower bounds exclude)."""
    n_all = engine.count({"range": {"ts": {"lte": "now/d"}}})
    assert n_all == len(corpus_pdf)
    assert engine.count({"range": {"ts": {"gte": "now-1d/d"}}}) == 0
    # anchor form against a fixed boundary inside the corpus range
    lo = "2026-01-01||+30m"
    explicit = corpus_pdf[corpus_pdf["ts"] >= dt.datetime(2026, 1, 1, 0, 30)]
    assert engine.count({"range": {"ts": {"gte": lo}}}) == len(explicit)


def test_datemath_grammar_never_crashes_on_valid_ops():
    """Property: any grammar-valid op chain resolves without raising and
    rounding is idempotent (floor(floor(x)) == floor(x))."""
    import datetime as dt

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from opensearch_spark.query import datemath as dm

    units = "yMwdhHms"
    op = st.one_of(
        st.tuples(st.sampled_from("+-"), st.integers(0, 500), st.sampled_from(units)).map(
            lambda t: f"{t[0]}{t[1]}{t[2]}"
        ),
        st.sampled_from(units).map(lambda u: f"/{u}"),
    )

    @given(st.lists(op, max_size=5), st.booleans())
    @settings(max_examples=200, deadline=None)
    def check(ops, up):
        expr = "now" + "".join(ops)
        t = dm.resolve(expr, dt.datetime(2024, 2, 29, 13, 7, 9), round_up=up)
        assert isinstance(t, dt.datetime)
        for u in units:
            f1 = dm._floor(t, u)
            assert dm._floor(f1, u) == f1

    check()


def test_resolve_msm_low_clamp_only():
    """Queries.calculateMinShouldMatch clamps only the low side: the
    result is never negative, percent forms never exceed n_clauses,
    and literal ints > n_clauses pass through unchanged (the query
    then matches nothing, per BooleanQuery semantics)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from opensearch_spark.query.executor import resolve_msm

    forms = st.one_of(
        st.integers(-20, 20),
        st.integers(-20, 20).map(str),
        st.integers(-150, 150).map(lambda p: f"{p}%"),
    )

    @given(forms, st.integers(0, 12))
    @settings(max_examples=300, deadline=None)
    def check(msm, n):
        v = resolve_msm(msm, n)
        assert v >= 0
        s = str(msm)
        if s.endswith("%") and int(s[:-1]) <= 100:
            assert v <= n
        if isinstance(msm, int) and msm > n:
            assert v == msm  # pass-through: match-nothing semantics

    check()
