"""``_search`` request-body adapter: the reference's JSON API surface.

Reference: ``SearchSourceBuilder.java`` (the body grammar),
``RestSearchAction.java`` (the REST entry),
``SearchResponse.java`` / ``SearchHits.java`` (the response envelope),
``AggregatorFactories.java`` (the ``aggs`` sub-tree parser).

The engine's Python API takes the body's pieces as kwargs
(``SearchEngine.search(query, size=, sort=, script_fields=, ...)``) and
aggregations as DataFrame combinators (``aggs.py``).  This module is
the missing *envelope*: it accepts the reference's FULL request body
verbatim and returns a reference-shaped response dict —

    resp = search_request(engine, {
        "query": {"match": {"text": "error handling"}},
        "size": 5,
        "_source": ["conv_id", "role"],
        "script_fields": {"dl2": {"script": {
            "lang": "painless", "source": "doc['dl'].value * 2"}}},
        "aggs": {"roles": {"terms": {"field": "role"},
                           "aggs": {"len": {"avg": {"field": "dl"}}}}},
    })
    resp["hits"]["hits"][0]["_score"], resp["aggregations"]["roles"]

Every body key maps onto an already-oracle-verified engine path; the
adapter adds no scoring/bucketing logic of its own.  Aggregations run
over the query's FULL matched docset (not the top-k page), exactly like
the reference's aggregation phase.

Scale notes: the hits page, every bucket list, and the aggregation
results are size-capped by construction (`size`, terms `size`,
histogram bucket counts) — the only ``collect()``s are on those tiny
frames.  The matched-docset frame feeding ``aggs`` stays distributed;
sibling top-level metric aggs share ONE ``agg()`` pass (one job), and
each bucket agg is one ``groupBy``.

Scope guards (documented, raise NotImplementedError): bucket-in-bucket
sub-aggregations deeper than metrics-under-one-bucket (use ``aggs.py``
combinators directly), aggregation ``filter``s that need postings
(full-text ``match`` — term-level filters work), and suggest/collapse
inside the body (both exist as engine/module APIs).
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional, Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from opensearch_spark import aggs as A
from opensearch_spark.query import dsl as Q
from opensearch_spark.query import painless

__all__ = ["search_request", "run_aggs"]

_BUCKET_KINDS = ("terms", "histogram", "date_histogram", "range",
                 "filter", "filters", "missing")
_METRIC_KINDS = ("avg", "sum", "min", "max", "value_count", "cardinality",
                 "stats", "extended_stats", "percentiles", "weighted_avg")
_PIPELINE_KINDS = ("derivative", "cumulative_sum")

_CAL_TRUNC = {"second": "second", "1s": "second", "minute": "minute",
              "1m": "minute", "hour": "hour", "1h": "hour", "day": "day",
              "1d": "day", "week": "week", "1w": "week", "month": "month",
              "1M": "month", "quarter": "quarter", "1q": "quarter",
              "year": "year", "1y": "year"}


# ------------------------------------------------------------ body parse

def _q_obj(body: dict):
    return Q.from_dict(body.get("query", {"match_all": {}}))


def _source_cols(engine, body) -> Optional[List[str]]:
    src = body.get("_source", True)
    if src is False:
        return []
    fields = engine.index.plan.get("input_fields") or []
    if src is True:
        return [c for c in fields if c not in engine.id_cols]
    if isinstance(src, str):
        src = [src]
    return [c for c in src if c not in engine.id_cols]


def _sort_spec(body) -> Optional[List[Tuple[object, str]]]:
    """REST sort list -> the engine's ``[(col_spec, direction)]``.

    Accepts every FieldSortBuilder.fromXContent shape: bare field
    string, ``{field: "asc"}``, ``{field: {"order": ...}}``,
    ``"_score"``, ``{"_script": {...}}``, ``{"_geo_distance": {...}}``.
    """
    raw = body.get("sort")
    if raw is None:
        return None
    if isinstance(raw, (str, dict)):
        raw = [raw]
    out: List[Tuple[object, str]] = []
    for entry in raw:
        if isinstance(entry, str):
            out.append((entry, "desc" if entry == "_score" else "asc"))
            continue
        key = next(iter(entry))
        spec = entry[key]
        if key == "_script":
            # {"_script": {"type", "script": {...}, "order"?}}
            script = dict(spec.get("script", spec))
            order = spec.get("order", "asc")
            out.append(({"_script": script}, order))
        elif key == "_geo_distance":
            order = spec.get("order", "asc")
            out.append(({"_geo_distance": spec}, order))
        elif isinstance(spec, str):
            out.append((key, spec))
        else:
            out.append((key, spec.get("order", "asc")))
    return out


def _script_fields(body) -> Optional[Dict[str, dict]]:
    raw = body.get("script_fields")
    if not raw:
        return None
    out = {}
    for name, spec in raw.items():
        s = dict(spec.get("script", spec))
        if "fields" in spec:
            s["fields"] = spec["fields"]
        out[name] = s
    return out


def _docvalue_fields(body) -> Optional[Dict[str, Optional[str]]]:
    raw = body.get("docvalue_fields")
    if not raw:
        return None
    out: Dict[str, Optional[str]] = {}
    for entry in raw:
        if isinstance(entry, str):
            out[entry] = None
        else:
            out[entry["field"]] = entry.get("format")
    return out


# ----------------------------------------------------------- aggregations

def _agg_column(spec: dict):
    """ValuesSourceAggregationBuilder: ``field`` or ``script`` input."""
    if "script" in spec:
        s = spec["script"]
        if isinstance(s, str):
            s = {"source": s}
        return painless.script_expr(
            s["source"], s.get("lang"), params=s.get("params")
        )
    return F.col(spec["field"])


def _metric_exprs(kind: str, spec: dict, prefix: str) -> List:
    """One metric agg -> aliased Column expressions (prefixed so many
    sibling metrics share one ``agg()`` pass)."""
    p = prefix
    if kind == "weighted_avg":
        v = _agg_column(spec["value"]).cast("double")
        w = _agg_column(spec["weight"]).cast("double")
        return [(F.sum(v * w) / F.sum(w)).alias(f"{p}:value")]
    c = _agg_column(spec)
    if kind not in ("value_count", "cardinality", "percentiles"):
        c = c.cast("double")
    if kind == "avg":
        return [F.avg(c).alias(f"{p}:value")]
    if kind == "sum":
        return [F.sum(c).alias(f"{p}:value")]
    if kind == "min":
        return [F.min(c).alias(f"{p}:value")]
    if kind == "max":
        return [F.max(c).alias(f"{p}:value")]
    if kind == "value_count":
        return [F.count(c).alias(f"{p}:value")]
    if kind == "cardinality":
        # exact distinct (the verifiable path; the HLL++ sketch lives in
        # aggs.cardinality(exact=False) for the 100TB scale path)
        return [F.count_distinct(_agg_column(spec)).alias(f"{p}:value")]
    if kind == "stats":
        return [F.count(c).alias(f"{p}:count"), F.min(c).alias(f"{p}:min"),
                F.max(c).alias(f"{p}:max"), F.sum(c).alias(f"{p}:sum"),
                F.avg(c).alias(f"{p}:avg")]
    if kind == "extended_stats":
        return [F.count(c).alias(f"{p}:count"), F.min(c).alias(f"{p}:min"),
                F.max(c).alias(f"{p}:max"), F.sum(c).alias(f"{p}:sum"),
                F.avg(c).alias(f"{p}:avg"),
                F.var_pop(c).alias(f"{p}:variance"),
                F.stddev_pop(c).alias(f"{p}:std_deviation")]
    if kind == "percentiles":
        pts = spec.get("percents", [1.0, 5.0, 25.0, 50.0, 75.0, 95.0, 99.0])
        return [F.percentile(c, F.lit(pt / 100.0)).alias(f"{p}:pct:{pt}")
                for pt in pts]
    raise NotImplementedError(f"metric agg {kind!r}")


def _metric_result(kind: str, row, prefix: str) -> dict:
    g = lambda k: row[f"{prefix}:{k}"]
    if kind in ("avg", "sum", "min", "max", "value_count", "cardinality",
                "weighted_avg"):
        return {"value": g("value")}
    if kind == "stats":
        return {k: g(k) for k in ("count", "min", "max", "avg", "sum")}
    if kind == "extended_stats":
        return {k: g(k) for k in ("count", "min", "max", "avg", "sum",
                                  "variance", "std_deviation")}
    if kind == "percentiles":
        vals = {}
        for name in row.__fields__:
            if name.startswith(f"{prefix}:pct:"):
                vals[f"{float(name.rsplit(':', 1)[1]):.1f}"] = row[name]
        return {"values": vals}
    raise NotImplementedError(kind)


def _split_agg(spec: dict) -> Tuple[str, dict, dict]:
    """(kind, kind_spec, sub_aggs) from one named agg body."""
    sub = spec.get("aggs", spec.get("aggregations", {})) or {}
    kinds = [k for k in spec if k not in ("aggs", "aggregations", "meta")]
    if len(kinds) != 1:
        raise ValueError(f"agg body must have exactly one type, got {kinds}")
    return kinds[0], spec[kinds[0]], sub


def _sub_metric_plan(sub_aggs: dict) -> List[Tuple[str, str, dict]]:
    """Metric sub-aggs under one bucket agg -> [(name, kind, spec)].
    Deeper bucket nesting is out of the adapter's scope (use aggs.py)."""
    plan = []
    for name, body in sub_aggs.items():
        kind, spec, deeper = _split_agg(body)
        if deeper or kind not in _METRIC_KINDS:
            raise NotImplementedError(
                "search_request supports metric sub-aggregations one level "
                "under a bucket agg; deeper trees via aggs.py combinators"
            )
        plan.append((name, kind, spec))
    return plan


def _bucket_response(rows, key_name: str, subs) -> List[dict]:
    out = []
    for r in rows:
        b = {"key": r[key_name], "doc_count": int(r["doc_count"])}
        for name, kind, _spec in subs:
            b[name] = _metric_result(kind, r, name)
        out.append(b)
    return out


def _terms_order(spec, subs) -> List:
    """BucketOrder (TermsAggregationBuilder.order): _count/_key/sub-agg
    path, compound list supported, key-asc tie-break appended."""
    raw = spec.get("order", {"_count": "desc"})
    if isinstance(raw, dict):
        raw = [raw]
    cols = []
    sub_names = {n for n, _k, _s in subs}
    for entry in raw:
        ((path, direction),) = entry.items()
        if path == "_count":
            col = "doc_count"
        elif path == "_key":
            col = "key"
        else:
            base = path.split(".", 1)[0]
            if base not in sub_names:
                raise ValueError(f"order path {path!r} is not a sub-agg")
            # dotted path agg.metric -> the prefixed alias
            col = path.replace(".", ":") if "." in path else f"{base}:value"
        cols.append(F.asc(col) if direction == "asc" else F.desc(col))
    cols.append(F.asc("key"))
    return cols


def _run_bucket(frame: DataFrame, kind: str, spec: dict, sub_aggs: dict,
                engine=None) -> dict:
    subs = _sub_metric_plan(sub_aggs)
    sub_exprs = [e for name, k, s in subs for e in _metric_exprs(k, s, name)]

    if kind == "terms":
        field, size = spec["field"], int(spec.get("size", 10))
        key = F.col(field)
        f = frame
        if "missing" in spec:
            key = F.coalesce(key, F.lit(spec["missing"]))
        else:
            f = f.filter(F.col(field).isNotNull())
        grouped = f.groupBy(key.alias("key")).agg(
            F.count(F.lit(1)).alias("doc_count"), *sub_exprs
        )
        mdc = int(spec.get("min_doc_count", 1))
        if mdc > 1:
            grouped = grouped.filter(F.col("doc_count") >= mdc)
        rows = grouped.orderBy(*_terms_order(spec, subs)).limit(size).collect()
        total = f.count()
        in_top = sum(int(r["doc_count"]) for r in rows)
        return {
            # single logical shard -> exact counts, like the reference
            # on one shard (InternalTerms.doc_count_error = 0)
            "doc_count_error_upper_bound": 0,
            "sum_other_doc_count": int(total - in_top),
            "buckets": _bucket_response(rows, "key", subs),
        }

    if kind == "histogram":
        field, interval = spec["field"], float(spec["interval"])
        key = (F.floor(F.col(field).cast("double") / interval)
               * F.lit(interval)).alias("key")
        grouped = (frame.filter(F.col(field).isNotNull())
                   .groupBy(key)
                   .agg(F.count(F.lit(1)).alias("doc_count"), *sub_exprs))
        mdc = int(spec.get("min_doc_count", 1))
        if mdc > 0:
            grouped = grouped.filter(F.col("doc_count") >= mdc)
        rows = grouped.orderBy(F.asc("key")).collect()
        return {"buckets": _bucket_response(rows, "key", subs)}

    if kind == "date_histogram":
        field = spec["field"]
        cal = spec.get("calendar_interval") or spec.get("interval")
        if cal not in _CAL_TRUNC:
            raise NotImplementedError(
                f"date_histogram interval {cal!r} (calendar units "
                f"{sorted(set(_CAL_TRUNC.values()))} supported)"
            )
        key = F.date_trunc(_CAL_TRUNC[cal], F.col(field)).alias("key")
        grouped = (frame.filter(F.col(field).isNotNull())
                   .groupBy(key)
                   .agg(F.count(F.lit(1)).alias("doc_count"), *sub_exprs))
        rows = grouped.orderBy(F.asc("key")).collect()
        buckets = []
        for r in rows:
            b = {"key_as_string": str(r["key"]),
                 "key": int(r["key"].timestamp() * 1000),
                 "doc_count": int(r["doc_count"])}
            for name, k, _s in subs:
                b[name] = _metric_result(k, r, name)
            buckets.append(b)
        return {"buckets": buckets}

    if kind == "range":
        field = F.col(spec["field"]).cast("double")
        buckets = []
        for rng in spec["ranges"]:
            lo, hi = rng.get("from"), rng.get("to")
            cond = F.lit(True)
            if lo is not None:
                cond = cond & (field >= float(lo))
            if hi is not None:
                cond = cond & (field < float(hi))
            sel = frame.filter(field.isNotNull()).filter(cond)
            row = sel.agg(F.count(F.lit(1)).alias("doc_count"),
                          *sub_exprs).collect()[0]
            key = rng.get("key") or (
                f"{lo if lo is not None else '*'}-"
                f"{hi if hi is not None else '*'}"
            )
            b = {"key": key, "doc_count": int(row["doc_count"])}
            if lo is not None:
                b["from"] = float(lo)
            if hi is not None:
                b["to"] = float(hi)
            for name, k, _s in subs:
                b[name] = _metric_result(k, row, name)
            buckets.append(b)
        return {"buckets": buckets}

    if kind in ("filter", "filters"):
        named = spec["filters"] if kind == "filters" else {"": spec}
        out = {}
        for name, qd in named.items():
            pred = engine._predicate(Q.from_dict(qd)) if engine else None
            if pred is None:
                raise NotImplementedError(
                    "aggregation filters must be term-level (columnar) "
                    "queries; full-text scoring filters via aggs.py"
                )
            row = frame.filter(pred).agg(
                F.count(F.lit(1)).alias("doc_count"), *sub_exprs
            ).collect()[0]
            b = {"doc_count": int(row["doc_count"])}
            for nm, k, _s in subs:
                b[nm] = _metric_result(k, row, nm)
            out[name] = b
        if kind == "filter":
            return out[""]
        return {"buckets": out}

    if kind == "missing":
        row = (frame.filter(F.col(spec["field"]).isNull())
               .agg(F.count(F.lit(1)).alias("doc_count"), *sub_exprs)
               .collect()[0])
        b = {"doc_count": int(row["doc_count"])}
        for name, k, _s in subs:
            b[name] = _metric_result(k, row, name)
        return b

    raise NotImplementedError(f"bucket agg {kind!r}")


def _run_pipeline(kind: str, spec: dict, results: dict) -> dict:
    """Sibling pipeline aggs over an ALREADY-COMPUTED bucket list —
    pure driver-side list arithmetic (the bucket list is size-capped)."""
    path = spec["buckets_path"]
    parent, _, metric = path.partition(">")
    src = results.get(parent)
    if src is None or "buckets" not in src:
        raise ValueError(f"buckets_path {path!r}: no bucket agg {parent!r}")
    vals = [
        (b["key"], b["doc_count"] if not metric or metric == "_count"
         else b[metric]["value"])
        for b in src["buckets"]
    ]
    if kind == "derivative":
        buckets = [{"key": k, "value": (v - vals[i - 1][1]) if i else None}
                   for i, (k, v) in enumerate(vals)]
    else:  # cumulative_sum
        run, buckets = 0.0, []
        for k, v in vals:
            run += v
            buckets.append({"key": k, "value": run})
    return {"buckets": buckets}


def run_aggs(frame: DataFrame, aggs_spec: dict, engine=None) -> dict:
    """Execute a reference ``aggs`` sub-tree over ``frame``.

    Sibling TOP-LEVEL metric aggs share one ``agg()`` job; each bucket
    agg is one ``groupBy``; pipeline aggs post-process sibling bucket
    lists driver-side.  See module docstring for scope guards."""
    metric_plan, bucket_plan, pipe_plan = [], [], []
    for name, body in aggs_spec.items():
        kind, spec, sub = _split_agg(body)
        if kind in _METRIC_KINDS:
            if sub:
                raise ValueError(f"metric agg {name!r} cannot have sub-aggs")
            metric_plan.append((name, kind, spec))
        elif kind in _PIPELINE_KINDS:
            pipe_plan.append((name, kind, spec))
        elif kind in _BUCKET_KINDS:
            bucket_plan.append((name, kind, spec, sub))
        else:
            raise NotImplementedError(
                f"agg {kind!r} — available via aggs.py combinators"
            )
    results: dict = {}
    if metric_plan:
        exprs = [e for name, k, s in metric_plan
                 for e in _metric_exprs(k, s, name)]
        row = frame.agg(*exprs).collect()[0]
        for name, k, _s in metric_plan:
            results[name] = _metric_result(k, row, name)
    for name, kind, spec, sub in bucket_plan:
        results[name] = _run_bucket(frame, kind, spec, sub, engine=engine)
    for name, kind, spec in pipe_plan:
        results[name] = _run_pipeline(kind, spec, results)
    return results


# -------------------------------------------------------------- response

def _hit_id(row, id_cols: Sequence[str]) -> str:
    return ":".join(str(row[c]) for c in id_cols)


def search_request(engine, body: dict) -> dict:
    """Run one reference-shaped ``_search`` request body; return the
    reference-shaped response (``hits.total/max_score/hits[]`` with
    ``_id/_score/_source/fields/sort``, plus ``aggregations``)."""
    t0 = time.monotonic()
    q = _q_obj(body)
    size = int(body.get("size", 10))
    from_ = int(body.get("from", 0))
    sort = _sort_spec(body)
    script_fields = _script_fields(body)
    docvalue_fields = _docvalue_fields(body)
    source_cols = _source_cols(engine, body)
    track = body.get("track_total_hits", 10000)

    total = engine.total_hits(q, track)

    rows: List = []
    if size > 0:
        if "rescore" in body:
            r = body["rescore"]
            rq = r["query"]
            rows = engine.rescore(
                q, rq["rescore_query"],
                window_size=int(r.get("window_size", 10)),
                query_weight=float(rq.get("query_weight", 1.0)),
                rescore_query_weight=float(rq.get("rescore_query_weight", 1.0)),
                score_mode=rq.get("score_mode", "total"),
                size=size,
            ).collect()
        else:
            rows = engine.search(
                q, size=size, from_=from_,
                source_cols=source_cols or None,
                sort=sort,
                search_after=body.get("search_after"),
                script_fields=script_fields,
                min_score=body.get("min_score"),
                terminate_after=body.get("terminate_after"),
                docvalue_fields=docvalue_fields,
            ).collect()

    # per-hit highlight via the oracle-verified fragment highlighter
    highlights: Dict[str, List[str]] = {}
    hl_field = None
    if body.get("highlight") and rows:
        h = body["highlight"]
        hl_field = next(iter(h.get("fields", {"text": {}})))
        opts = h["fields"][hl_field] if h.get("fields") else {}
        merged = {**h, **opts}
        # the fragment pass selects top-k by RELEVANCE; under a custom
        # sort the page may contain lower-relevance hits, so widen the
        # window (best-effort beyond 10x page size — documented; the
        # reference highlights during its fetch phase per returned hit)
        frag_k = size + from_ if sort is None else max(10 * (size + from_), 100)
        frags = engine.search_highlight_fragments(
            q, size=frag_k,
            pre_tag=(merged.get("pre_tags") or ["<em>"])[0],
            post_tag=(merged.get("post_tags") or ["</em>"])[0],
            fragment_size=int(merged.get("fragment_size", 100)),
            number_of_fragments=int(merged.get("number_of_fragments", 5)),
            order=merged.get("order"),
            no_match_size=int(merged.get("no_match_size", 0)),
            require_field_match=bool(merged.get("require_field_match", True)),
        ).collect()
        for fr in frags:
            highlights.setdefault(_hit_id(fr, engine.id_cols), []).append(
                fr["fragment"]
            )

    hits = []
    script_names = list(script_fields or ())
    dv_names = list(docvalue_fields or ())
    for r in rows:
        d = r.asDict()
        hit = {
            "_id": _hit_id(r, engine.id_cols),
            "_score": d.get("score"),
            "_source": {c: d[c] for c in (source_cols or []) if c in d},
        }
        for c in engine.id_cols:
            hit["_source"].setdefault(c, d[c])
        flds = {n: [d[n]] for n in script_names + dv_names if n in d}
        if flds:
            hit["fields"] = flds
        if sort is not None:
            keys = []
            for col, _dir in sort:
                if col == "_score":
                    keys.append(d.get("score"))
                elif isinstance(col, str) and col in d:
                    keys.append(d[col])
            hit["sort"] = keys
        hid = hit["_id"]
        if hid in highlights:
            hit["highlight"] = {hl_field: highlights[hid]}
        hits.append(hit)

    resp = {
        "took": int((time.monotonic() - t0) * 1000),
        "timed_out": False,
        "hits": {
            "total": total,
            "max_score": max((h["_score"] for h in hits
                              if h["_score"] is not None), default=None),
            "hits": hits,
        },
    }
    if body.get("aggs") or body.get("aggregations"):
        spec = body.get("aggs") or body.get("aggregations")
        # the aggregation phase sees the FULL matched docset (deletes
        # applied), not the hits page — AggregationPhase.java semantics
        matched = engine._apply_deletes(engine._score(q)).select("_docid")
        frame = matched.join(engine.docmap(), "_docid")
        resp["aggregations"] = run_aggs(frame, spec, engine=engine)
    return resp
