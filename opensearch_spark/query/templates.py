"""Search templates — the ``lang-mustache`` module analog.

The reference renders stored/inline mustache templates into query JSON
(``modules/lang-mustache``; ``_render/template`` +
``_search/template`` REST APIs).  Implemented subset: ``{{var}}``
substitution and ``{{#toJson}}var{{/toJson}}`` JSON embedding — enough
for the parameterized-query use case (the reference's own docs examples
are all of this shape); mustache sections/inverted sections are NOT
supported and raise at json.loads rather than silently passing
through.  Rendering happens entirely driver-side at
parse time; the output is the same query dict ``dsl.from_dict``
consumes, so compilation/scoring is unchanged."""

from __future__ import annotations

import json
import re
from typing import Any, Dict

_TOJSON_RE = re.compile(r"\{\{#toJson\}\}\s*(\w+)\s*\{\{/toJson\}\}")
_VAR_RE = re.compile(r"\{\{\s*(\w+)\s*\}\}")


def render_search_template(source, params: Dict[str, Any]) -> dict:
    """Render a template (string or dict with a ``source`` key) into a
    query dict.  Missing params render as empty strings (mustache's
    lenient default)."""
    if isinstance(source, dict):
        source = source.get("source", source)
    if isinstance(source, dict):
        source = json.dumps(source)

    def tojson(m):
        return json.dumps(params.get(m.group(1)))

    def var(m):
        v = params.get(m.group(1), "")
        return json.dumps(v)[1:-1] if isinstance(v, str) else json.dumps(v)

    rendered = _TOJSON_RE.sub(tojson, source)
    rendered = _VAR_RE.sub(var, rendered)
    return json.loads(rendered)


def msearch_template(engine, requests, size: int = 10, round_dp=None):
    """``_msearch/template`` (rest-api-spec ``msearch_template.json``):
    a batch of templated searches — each request is ``{"id": ...,
    "source": <template>, "params": {...}, "size": n}`` — rendered
    driver-side and executed as one unioned DataFrame tagged by
    ``query_id`` (the ``_msearch`` batching shape: Spark schedules the
    per-query plans concurrently, amortizing job overhead exactly like
    the reference amortizes network round-trips).

    ``round_dp``: when set, scores are rounded to that many decimals
    BEFORE the top-k ordering (ties then break by id) — the
    oracle-comparable contract of ``docs_index.topk``, so boundary rows
    are stable under float summation-order noise.  Default None keeps
    raw-score ordering (the user-facing search path)."""
    from functools import reduce

    from pyspark.sql import DataFrame
    from pyspark.sql import functions as F

    parts = []
    for i, req in enumerate(requests):
        source = req.get("source", req.get("template"))
        if source is None:
            raise ValueError(
                f"msearch_template request {i} has neither 'source' nor 'template'"
            )
        q = render_search_template(source, req.get("params", {}))
        k = int(req.get("size", size))
        if round_dp is None:
            df = engine.search(q, size=k)
        else:
            from opensearch_spark.query import dsl as Q

            qq = Q.from_dict(q) if isinstance(q, dict) else q
            scored = engine._score(qq)
            dm = engine.index.docmap().select("_docid", *engine.id_cols)
            order = [F.desc("score")] + [F.asc(c) for c in engine.id_cols]
            df = (
                scored.join(dm, "_docid")
                .withColumn("score", F.round(F.col("score"), int(round_dp)))
                .orderBy(*order)
                .limit(k)
                .select(*engine.id_cols, "score")
            )
        parts.append(df.withColumn("query_id", F.lit(str(req.get("id", f"q{i}")))))
    if not parts:
        raise ValueError("msearch_template requires at least one request")
    return reduce(DataFrame.unionByName, parts)
