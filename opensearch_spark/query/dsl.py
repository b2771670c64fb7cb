"""Query DSL — a typed mirror of the reference's JSON Query DSL subset.

Each node corresponds to a registered query in the reference's
``search/SearchModule.java:1081-1165`` registry; semantics cited per class
(SURVEY.md §2.2).  Nodes are plain dataclasses; compilation to DataFrame
plans lives in ``opensearch_spark.query.executor``.

``from_dict`` parses the JSON-ish dict form (the Query DSL shape), so specs
like ``{"bool": {"must": [{"match": {"text": "error handling"}}]}}`` work.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

Query = Union[
    "Match",
    "MatchPhrase",
    "MatchPhrasePrefix",
    "MatchBoolPrefix",
    "MultiMatch",
    "MatchAll",
    "MatchNone",
    "Term",
    "Terms",
    "TermsLookup",
    "TermsSet",
    "Range",
    "Exists",
    "Ids",
    "Prefix",
    "Wildcard",
    "Regexp",
    "Fuzzy",
    "Bool",
    "ConstantScore",
    "DisMax",
    "Boosting",
    "MoreLikeThis",
    "FunctionScore",
]


@dataclasses.dataclass
class _Gap:
    """Parse-time marker for a ``span_gap`` clause inside ``span_near``
    (``SpanGapQueryBuilder``); folded into ``SpanNear.gaps`` — never a
    standalone query."""

    width: int


@dataclasses.dataclass
class Match:
    """Full-text match (``index/query/MatchQueryBuilder.java:59,85,88``):
    analyze the query text with the field analyzer, OR (default) or AND the
    per-term scoring clauses; duplicate tokens become duplicate clauses
    (scores add).  ``minimum_should_match`` counts clauses."""

    field: str
    query: str
    operator: str = "or"  # MatchQueryBuilder default operator OR
    minimum_should_match: Optional[int] = None
    boost: float = 1.0


@dataclasses.dataclass
class MatchPhrase:
    """Exact consecutive positions, slop=0 default
    (``MatchPhraseQueryBuilder.java``, ``MatchQuery.java:332``); scored as
    one clause whose idf is the sum of per-term idfs and whose tf is the
    phrase frequency (Lucene PhraseQuery semantics)."""

    field: str
    query: str
    slop: int = 0
    boost: float = 1.0


@dataclasses.dataclass
class MatchPhrasePrefix:
    """Phrase whose last slot matches any dictionary term with the given
    prefix (``MatchPhrasePrefixQueryBuilder.java``; max_expansions 50).
    Documented scoring: one clause whose idf = sum of fixed-term idfs +
    idf(df of the expansion union), tf = phrase frequency."""

    field: str
    query: str
    max_expansions: int = 50
    boost: float = 1.0


@dataclasses.dataclass
class MatchBoolPrefix:
    """Bool composition of per-term scoring clauses with the last term
    as a constant-score prefix clause
    (``MatchBoolPrefixQueryBuilder.java``; ``MatchQuery.java:328``).
    ``operator`` AND requires every clause; ``minimum_should_match``
    counts matched clauses (terms + the prefix clause); ``fuzziness``
    turns the FIXED terms into constant-score fuzzy expansions (the
    trailing prefix clause never fuzzes); ``analyzer`` overrides the
    query-side analysis chain for this request."""

    field: str
    query: str
    boost: float = 1.0
    operator: str = "or"
    minimum_should_match: Optional[int] = None
    analyzer: Optional[object] = None
    fuzziness: Optional[object] = None
    prefix_length: int = 0
    max_expansions: int = 50


@dataclasses.dataclass
class MultiMatch:
    """Match over several fields with per-field boosts
    (``MultiMatchQueryBuilder.java``; engine ``index/search/MultiMatchQuery.java``).
    ``type`` best_fields (dis_max + tie_breaker) or most_fields (sum).
    Non-text fields behave as keyword term matches scored 1.0."""

    query: str
    fields: Sequence[Tuple[str, float]]  # (field, boost)
    type: str = "best_fields"
    tie_breaker: float = 0.0
    operator: str = "or"
    boost: float = 1.0
    # bool_prefix pass-throughs (each per-field clause is a
    # MatchBoolPrefix carrying these)
    minimum_should_match: Optional[int] = None
    analyzer: Optional[object] = None
    fuzziness: Optional[object] = None
    prefix_length: int = 0
    max_expansions: int = 50


@dataclasses.dataclass
class MoreLikeThis:
    """``more_like_this`` over existing docs (``MoreLikeThisQueryBuilder.java``):
    select the example docs' top ``max_query_terms`` terms by tf*idf
    (tie: term asc), OR them with minimum_should_match 30% (floor), and
    exclude the example docs themselves (include=false default)."""

    like_ids: Sequence[Any]
    field: str = "text"
    max_query_terms: int = 10
    min_doc_freq: int = 2
    minimum_should_match_pct: float = 0.3
    boost: float = 1.0


@dataclasses.dataclass
class FieldValueFactor:
    field: str
    factor: float = 1.0
    modifier: str = "none"  # none | log1p | sqrt | square
    missing: float = 0.0


@dataclasses.dataclass
class ScoreFunction:
    """One entry of ``function_score.functions``: optional filter, then
    weight and/or field_value_factor and/or gauss decay
    (registry ``SearchModule.java:927-955``)."""

    filter: Optional["Query"] = None
    weight: Optional[float] = None
    field_value_factor: Optional[FieldValueFactor] = None
    gauss: Optional[Dict[str, float]] = None  # {field, origin, scale, offset?, decay?}
    exp: Optional[Dict[str, float]] = None  # exponential decay, same keys
    linear: Optional[Dict[str, float]] = None  # linear decay, same keys
    random_score: Optional[Dict[str, object]] = None  # {seed?, field?}
    # ScriptScoreFunctionBuilder.java: {"script": {"source", "lang"?,
    # "params"?}} — the function's value is the script result (may read
    # _score); Painless or Spark SQL per ScriptScore.lang rules
    script_score: Optional[Dict[str, object]] = None


@dataclasses.dataclass
class FunctionScore:
    """``function_score`` (``functionscore/FunctionScoreQueryBuilder.java``):
    rescore the wrapped query with functions; ``score_mode`` combines
    function values (multiply/sum/max/min/avg), ``boost_mode`` combines
    with the query score (multiply/sum/replace)."""

    query: "Query"
    functions: Sequence[ScoreFunction] = ()
    score_mode: str = "multiply"
    boost_mode: str = "multiply"
    boost: float = 1.0


@dataclasses.dataclass
class Intervals:
    """``intervals`` match source (``IntervalQueryBuilder.java``,
    ``IntervalsSourceProvider.java``): all terms present within a window
    whose in-between gap total is <= ``max_gaps``; ``ordered`` requires
    the terms in query order.  Scored like a phrase clause (summed idf,
    tf = number of minimal matching intervals)."""

    field: str
    query: str = ""
    max_gaps: int = -1  # -1 = unbounded
    ordered: bool = False
    boost: float = 1.0
    # composition (IntervalsSourceProvider any_of/all_of): slots of the
    # (ordered) interval algebra; each slot is a list of alternative
    # terms (any_of).  When set, ``query`` is ignored.  Scoring: one
    # clause, idf = sum over distinct member terms (documented
    # approximation), tf = minimal-interval count with per-slot unions.
    any_of_groups: Optional[Sequence[Sequence[str]]] = None
    # IntervalQueryBuilder `filter` (IntervalFilter.java -> Lucene
    # Intervals.containing / notContaining / containedBy /
    # notContainedBy / overlapping / nonOverlapping / before / after):
    # (relation, filter-source Intervals).  Base minimal intervals are
    # kept per the relation against the filter source's intervals.
    filter: Optional[Tuple[str, "Intervals"]] = None


@dataclasses.dataclass
class SpanNear:
    """``span_near`` (``SpanNearQueryBuilder.java``): span clauses within
    ``slop`` positions, optionally ``in_order`` — compiled onto the same
    interval algebra (slop = max_gaps)."""

    field: str
    terms: Sequence[str]  # span_term clauses (no analysis)
    slop: int = 0
    in_order: bool = True
    boost: float = 1.0
    # gaps[i] = fixed positions reserved between terms[i] and
    # terms[i+1] (``span_gap`` clauses, ``SpanGapQueryBuilder`` ->
    # ``SpanNearQuery.addGap``; ordered-only, like Lucene)
    gaps: Optional[Sequence[int]] = None


@dataclasses.dataclass
class SpanOr:
    """``span_or`` (``SpanOrQueryBuilder.java``, registry
    ``SearchModule.java:1109-1138``): union of span clauses.  Over
    ``span_term`` clauses (width-1 spans) the union is exactly a
    disjunction of term scorers — compiled to the OR match machinery
    (documented deviation: Lucene scores via span frequency; for
    width-1 spans the matching doc set is identical)."""

    field: str
    terms: Sequence[str]
    boost: float = 1.0


@dataclasses.dataclass
class SpanNot:
    """``span_not`` (``SpanNotQueryBuilder.java``): positions of the
    ``include`` term whose [pos-pre, pos+post] window contains no
    position of any ``exclude`` term; tf = surviving positions, scored
    as a BM25 clause of the include term."""

    field: str
    include: str
    exclude: Sequence[str]
    pre: int = 0
    post: int = 0
    boost: float = 1.0


@dataclasses.dataclass
class SpanContaining:
    """``span_containing`` (``SpanContainingQueryBuilder.java``): big
    spans (a ``span_near`` over ``big_terms``) that fully contain a
    ``little`` span_term; tf = count of qualifying big intervals,
    scored as one BM25 clause (idf = sum over involved terms,
    documented approximation)."""

    field: str
    big_terms: Sequence[str]
    little: str
    big_slop: int = 0
    big_in_order: bool = True
    boost: float = 1.0


@dataclasses.dataclass
class SpanWithin:
    """``span_within`` (``SpanWithinQueryBuilder.java``): positions of
    the ``little`` span_term lying inside some big span; tf = count of
    qualifying little positions."""

    field: str
    big_terms: Sequence[str]
    little: str
    big_slop: int = 0
    big_in_order: bool = True
    boost: float = 1.0


@dataclasses.dataclass
class SpanFirst:
    """``span_first`` (``SpanFirstQueryBuilder.java``): the term's span
    must end within the first ``end`` positions (0-based position <
    ``end``); tf = qualifying positions."""

    field: str
    term: str
    end: int
    boost: float = 1.0


@dataclasses.dataclass
class SpanMulti:
    """``span_multi`` (``SpanMultiTermQueryBuilder.java``; registry
    ``SearchModule.java:1109-1138``): wraps a multi-term query
    (prefix/wildcard/regexp/fuzzy) as a span — the dictionary expansion
    becomes a width-1 span disjunction (the top-terms span rewrite).
    Standalone it scores as an OR of per-term BM25 scorers (the SpanOr
    convention); as a ``span_near`` clause the expansion becomes that
    slot's any_of group in the interval algebra."""

    field: str
    match: Query  # Prefix | Wildcard | Regexp | Fuzzy
    boost: float = 1.0


@dataclasses.dataclass
class FieldMaskingSpan:
    """``field_masking_span`` (``FieldMaskingSpanQueryBuilder.java``):
    a span clause whose positions come from ``source_field``'s postings
    but which participates in a span composition on the mask ``field``.
    Positions align across the per-field indexes by construction (every
    field index is built from the same docs + routing, and derived
    fields like ``title`` are positional prefixes of ``text``), so the
    mask performs a real cross-field positional join
    (``query/multifield.py:score_span_near_masked``).  Like the
    reference, the mask field's norms drive length normalization; idf
    comes from the source field's own statistics (documented deviation
    from Lucene, which uses the mask field's weights throughout)."""

    field: str  # the mask (combining) field
    source_field: str  # where positions and term statistics come from
    term: str
    boost: float = 1.0


@dataclasses.dataclass
class DistanceFeature:
    """``distance_feature`` (``DistanceFeatureQueryBuilder.java``): boost
    docs near an origin: score = boost * pivot / (pivot + |x - origin|)."""

    field: str
    origin: Any
    pivot: float
    boost: float = 1.0


@dataclasses.dataclass
class RankFeature:
    """``rank_feature`` (modules/mapper-extras
    ``RankFeatureQueryBuilder.java``): score a positive numeric feature
    with one of the reference's score functions — ``log``:
    ln(scaling_factor + S); ``saturation``: S / (S + pivot), pivot
    defaulting to the field's geometric mean (the reference's computed
    default, RankFeatureQueryBuilder.ScoreFunction.Saturation);
    ``sigmoid``: S^exp / (S^exp + pivot^exp).  Docs without a positive
    feature do not match.  Documented deviation: the reference stores
    features freq-quantized (Lucene FeatureField's reduced-precision
    float); we read the doc-values column at full precision — same
    ordering, tighter score values."""

    field: str
    function: str = "saturation"  # log | saturation | sigmoid
    pivot: Optional[float] = None
    scaling_factor: float = 1.0
    exponent: float = 1.0
    boost: float = 1.0


@dataclasses.dataclass
class ScriptScore:
    """``script_score`` (``ScriptScoreQueryBuilder.java``): replace the
    score with an expression over ``_score`` and doc columns — the
    Catalyst-expression analog of Painless (``modules/lang-expression``);
    ``fn`` optionally supplies a vectorized pandas callable instead."""

    query: "Query"
    expr: Optional[str] = None  # script source, may reference _score
    fn: Any = None  # callable(pd.DataFrame) -> pd.Series (pandas UDF path)
    input_cols: Sequence[str] = ()
    boost: float = 1.0
    # "painless" routes expr through query/painless.py (the reference's
    # own script syntax); None = Spark SQL with a syntactic sniff
    lang: Optional[str] = None
    params: Optional[dict] = None


@dataclasses.dataclass
class ScriptQuery:
    """``script`` query (``ScriptQueryBuilder.java``): filter context —
    keep docs where a boolean expression over doc columns evaluates
    true; constant score.  Expression language = Spark SQL (the
    Catalyst analog of Painless, same documented deviation as
    ``ScriptScore.expr``)."""

    expr: str
    boost: float = 1.0
    lang: Optional[str] = None  # see ScriptScore.lang
    params: Optional[dict] = None


@dataclasses.dataclass
class CommonTerms:
    """``common`` terms query (``CommonTermsQueryBuilder.java`` ->
    Lucene ``CommonTermsQuery``; deprecated upstream but still
    registered, ``SearchModule.java``).  Analyzed terms are split by
    document frequency at the ``cutoff_frequency`` threshold (a
    fraction of doc_count when < 1, absolute df otherwise,
    ``CommonTermsQuery.rewrite``): low-frequency terms form the
    required clause group, high-frequency terms a should-only group
    that adds score to docs already matched by the low group.  When
    every term is high-frequency the high group is required on its
    own (Lucene's fallback)."""

    field: str
    query: str
    cutoff_frequency: float = 0.01
    low_freq_operator: str = "or"  # 'or' | 'and'
    high_freq_operator: str = "or"
    minimum_should_match: Optional[Any] = None  # low_freq msm, or
    # {"low_freq": ..., "high_freq": ...} (CommonTermsQueryBuilder.java:104-106)
    boost: float = 1.0


@dataclasses.dataclass
class MatchAll:
    """All docs, score 1.0 (``MatchAllQueryBuilder.java``)."""

    boost: float = 1.0


@dataclasses.dataclass
class MatchNone:
    """No docs (``MatchNoneQueryBuilder.java``)."""


@dataclasses.dataclass
class Term:
    """Exact term, NO analysis of the input (``TermQueryBuilder.java``;
    keyword-analyzer short-circuit ``MatchQuery.java:303-310``).  On the
    indexed text field this is a single-token BM25 scorer; on any other
    column it is an exact-equality match scored 1.0."""

    field: str
    value: Any
    boost: float = 1.0


@dataclasses.dataclass
class Terms:
    """OR over exact terms (``TermsQueryBuilder.java``); constant score 1.0
    like the reference's constant-score rewrite of terms queries."""

    field: str
    values: Sequence[Any]
    boost: float = 1.0


@dataclasses.dataclass
class TermsLookup:
    """Terms lookup variant (``TermsQueryBuilder.java`` fetch-based
    rewrite / ``indices/TermsLookup.java``): GET the document ``id`` and
    use the exact values found at ``path`` as the terms list — a
    semi-join against another doc's field.  The engine resolves the
    lookup at plan time (one pushdown point-read on the docmap — the
    analog of the reference's synchronous GET in
    ``TermsQueryBuilder.rewrite``) and rewrites to a plain Terms query;
    no values -> match_none (MatchNoDocsQuery parity).  ``id`` is a
    value for the primary id column or a dict of id_col -> value."""

    field: str
    id: Any
    path: str
    boost: float = 1.0


@dataclasses.dataclass
class TermsSet:
    """Terms with per-doc dynamic minimum-should-match
    (``TermsSetQueryBuilder.java``): doc matches when it contains at least
    ``minimum_should_match_field``'s value many of the terms."""

    field: str
    values: Sequence[str]
    minimum_should_match_field: str
    boost: float = 1.0


@dataclasses.dataclass
class Range:
    """Range on any column, gt/gte/lt/lte (``RangeQueryBuilder.java``)."""

    field: str
    gt: Any = None
    gte: Any = None
    lt: Any = None
    lte: Any = None
    boost: float = 1.0


@dataclasses.dataclass
class Exists:
    """Field has a non-null value (``ExistsQueryBuilder.java``)."""

    field: str
    boost: float = 1.0


@dataclasses.dataclass
class Ids:
    """Docs by id tuples over the index id columns (``IdsQueryBuilder.java``)."""

    values: Sequence[Tuple]
    boost: float = 1.0


@dataclasses.dataclass
class Prefix:
    """Term-dictionary prefix expansion, constant-score rewrite
    (``PrefixQueryBuilder.java``)."""

    field: str
    value: str
    boost: float = 1.0


@dataclasses.dataclass
class Wildcard:
    """``*``/``?`` wildcard over the term dictionary, constant-score rewrite
    (``WildcardQueryBuilder.java``)."""

    field: str
    value: str
    boost: float = 1.0


@dataclasses.dataclass
class Regexp:
    """Anchored regex over the term dictionary, constant-score rewrite
    (``RegexpQueryBuilder.java``)."""

    field: str
    value: str
    boost: float = 1.0


@dataclasses.dataclass
class Fuzzy:
    """Terms within Levenshtein distance, AUTO fuzziness from length
    (<3: 0, 3-5: 1, else 2), prefix_length 0, max_expansions 50
    (``FuzzyQueryBuilder.java``; defaults ``MatchQueryBuilder.java:100-104``).
    Deviation noted: expansions are scored as an OR of per-term BM25
    scorers (the reference blends df across expanded terms)."""

    field: str
    value: str
    fuzziness: Optional[int] = None  # None = AUTO
    prefix_length: int = 0
    max_expansions: int = 50
    boost: float = 1.0
    # FuzzyQueryBuilder.DEFAULT_TRANSPOSITIONS = true: a transposition
    # counts one edit (r5 session 3; previously plain Levenshtein).
    # Deviation note: the refine computes UNRESTRICTED
    # Damerau-Levenshtein (matching the DuckDB oracle's
    # damerau_levenshtein exactly); Lucene's automaton is the
    # restricted/OSA variant, which can differ only when an edit lands
    # inside a transposed pair — there unrestricted distance is lower,
    # so the expansion set is a superset on that rare corner.
    transpositions: bool = True


@dataclasses.dataclass
class GeoDistance:
    """``geo_distance`` (``GeoDistanceQueryBuilder.java``): docs whose
    point lies within ``distance_km`` of the origin, arc (haversine)
    distance — the reference's default ``GeoDistance.ARC`` on the mean
    earth radius.  Geo points are modeled as a COLUMN PAIR
    (``<field>_lat``/``<field>_lon``; the conventional field name
    ``location`` maps to bare ``lat``/``lon``) — the Spark-native
    analog of the geo_point doc-values encoding; the predicate is a
    pure Catalyst trig expression over doc values (no postings)."""

    field: str
    lat: float
    lon: float
    distance_km: float
    boost: float = 1.0


@dataclasses.dataclass
class GeoBoundingBox:
    """``geo_bounding_box`` (``GeoBoundingBoxQueryBuilder.java``): pure
    comparisons on the lat/lon column pair; a lon range crossing the
    antimeridian (left > right) splits into an OR of two ranges (the
    reference's dateline handling)."""

    field: str
    top: float
    left: float
    bottom: float
    right: float
    boost: float = 1.0


@dataclasses.dataclass
class GeoPolygon:
    """``geo_polygon`` (``GeoPolygonQueryBuilder.java``): docs whose
    point lies inside the closed polygon.  Even-odd ray casting on the
    (lon, lat) plane — the planar analog of Lucene's
    ``Polygon2D.contains``; vertices are plan-time literals, so the
    per-edge crossing tests unroll into one pure Catalyst boolean
    expression over the lat/lon column pair (whole-stage codegen, no
    UDF).  Documented deviation: planar edges, not geodesics — for the
    small polygons the reference test suites use the memberships
    agree."""

    field: str
    points: Sequence[Tuple[float, float]]  # (lat, lon) vertices, open ring
    boost: float = 1.0


@dataclasses.dataclass
class GeoShape:
    """``geo_shape`` (``GeoShapeQueryBuilder.java``) restricted to
    POINT-indexed documents: the doc side is the lat/lon column pair,
    so every spatial relation reduces to a point-membership predicate
    over plan-time shape literals (one Catalyst boolean, no UDF).
    ``shape`` is the reference's inline GeoJSON-ish dict
    (``ShapeBuilder`` forms): ``envelope`` (top-left/bottom-right,
    dateline-splitting like geo_bounding_box), ``polygon`` with holes
    (per-ring even-odd ray cast XORed — Lucene ``Polygon2D`` analog,
    planar), ``point``, ``circle`` (center + radius, haversine),
    ``multipoint`` / ``multipolygon`` / ``geometrycollection`` (OR of
    members).  Relations (``ShapeRelation.java``): ``intersects``
    (default) and ``within`` coincide for point docs; ``disjoint`` is
    the null-safe negation; ``contains`` holds only for an equal
    ``point`` shape.  ENVELOPE-VALUED doc fields are supported too
    (late r4): when the docmap column is a struct
    ``(min_lat, max_lat, min_lon, max_lon)`` — mappings decide the doc
    side in the reference, the schema does here — every relation
    evaluates as exact interval algebra against an envelope/point
    query shape (``executor._envelope_doc_pred``).  Documented
    deviation: general indexed SHAPE geometries (BKD polygons) and
    ``indexed_shape`` references stay out of scope."""

    field: str
    shape: Optional[Dict[str, Any]] = None
    relation: str = "intersects"
    boost: float = 1.0
    # indexed_shape (GeoShapeQueryBuilder indexedShape* / the fetch in
    # AbstractGeometryQueryBuilder.fetch): the query shape lives in
    # ANOTHER document — {"id": <id or {id_col: v}>, "path": <column>}.
    # Resolved plan-time by one docmap point-read (same pattern as
    # terms lookup); the fetched column is an envelope struct or an
    # inline shape dict.
    indexed_shape: Optional[Dict[str, Any]] = None


@dataclasses.dataclass
class Knn:
    """``knn`` vector query.  BEYOND the reference core: the reference
    ships vector search as the separate k-NN plugin (not under
    ``server/`` — absent from this repo's reference checkout), so this
    follows the plugin's public ``KNNQueryBuilder`` request shape
    ``{"knn": {field: {"vector": [...], "k": N, "filter": {...}}}}``
    as a pipeline-tier integration of the ops/similarity machinery
    into the query surface.  Exact scoring over the docmap vector
    column (one shuffle-free columnar pass + global top-k); the IVF
    cell-pruned index (``ops/similarity.ivf_topk_indexed``) is the
    corpus-scale accelerator for the same contract.  ``space_type``
    score translations (documented contract, not plugin parity):
    ``cosinesimil`` -> raw cosine, ``l2`` -> 1/(1 + squared distance),
    ``innerproduct`` -> raw dot product."""

    field: str
    vector: Sequence[float] = ()
    k: int = 10
    filter: Optional[Query] = None
    space_type: str = "cosinesimil"
    boost: float = 1.0


@dataclasses.dataclass
class Bool:
    """Boolean composition (``BoolQueryBuilder.java:66-74``): ``must`` AND +
    scores, ``filter`` AND no score, ``should`` OR + scores with
    ``minimum_should_match`` defaulting to 1 when there is no must/filter
    else 0, ``must_not`` NOT no score.  Score = sum of matching scoring
    clauses."""

    must: Sequence[Query] = ()
    filter: Sequence[Query] = ()
    should: Sequence[Query] = ()
    must_not: Sequence[Query] = ()
    minimum_should_match: Optional[int] = None
    boost: float = 1.0


@dataclasses.dataclass
class ConstantScore:
    """Wrap a filter, fixed score = boost (``ConstantScoreQueryBuilder.java``)."""

    filter: Query
    boost: float = 1.0


@dataclasses.dataclass
class DisMax:
    """Union of subqueries; score = best + tie_breaker * sum(others)
    (``DisMaxQueryBuilder.java``)."""

    queries: Sequence[Query]
    tie_breaker: float = 0.0
    boost: float = 1.0


@dataclasses.dataclass
class Boosting:
    """Positive query demoted by ``negative_boost`` when the negative query
    also matches (``BoostingQueryBuilder.java``)."""

    positive: Query
    negative: Query
    negative_boost: float = 0.5


def parse_distance_km(dist) -> float:
    """``DistanceUnit.java`` suffix grammar -> km; unitless values are
    METERS (the reference's ``DistanceUnit.DEFAULT``)."""
    if not isinstance(dist, str):
        return float(dist) / 1000.0
    # longest suffix first so 'nmi' never hits the 'mi' branch and
    # 'cm'/'mm' never hit 'm'
    units = [
        ("nmi", 1.852), ("km", 1.0), ("mi", 1.609344),
        ("yd", 0.0009144), ("ft", 0.0003048), ("in", 0.0000254),
        ("cm", 0.00001), ("mm", 0.000001), ("m", 0.001),
    ]
    d = dist.strip().lower()
    for suf, km_per in units:
        if d.endswith(suf):
            return float(d[: -len(suf)]) * km_per
    return float(d) / 1000.0


_SHAPE_TYPES = {
    "envelope", "polygon", "point", "circle",
    "multipoint", "multipolygon", "geometrycollection",
}


def _validate_shape(shape: Dict[str, Any]) -> None:
    """Plan-time structural check of an inline geo_shape body — reject
    unknown types and malformed rings before any Spark plan is built
    (the reference fails shape parsing at query-parse time too)."""
    t = str(shape.get("type", "")).lower()
    if t not in _SHAPE_TYPES:
        raise ValueError(f"unsupported geo_shape type: {shape.get('type')!r}")
    if t == "geometrycollection":
        members = shape.get("geometries", [])
        if not members:
            raise ValueError("geometrycollection needs at least one geometry")
        for m in members:
            _validate_shape(m)
        return
    coords = shape.get("coordinates")
    if coords is None:
        raise ValueError(f"geo_shape {t} needs coordinates")
    if t == "envelope" and len(coords) != 2:
        raise ValueError("envelope needs [[minLon,maxLat],[maxLon,minLat]]")
    if t == "polygon":
        for ring in coords:
            # open or pre-closed ring, >= 3 distinct vertices
            n = len(ring) - (1 if len(ring) > 1 and ring[0] == ring[-1] else 0)
            if n < 3:
                raise ValueError("polygon ring needs at least 3 distinct points")
    if t == "multipolygon":
        for poly in coords:
            _validate_shape({"type": "polygon", "coordinates": poly})
    if t == "circle":
        parse_distance_km(shape.get("radius", "0m"))


def from_dict(spec: Dict[str, Any]) -> Query:
    """Parse the JSON Query-DSL dict shape into typed nodes."""
    if len(spec) != 1:
        raise ValueError(f"query object must have exactly one key: {spec}")
    kind, body = next(iter(spec.items()))
    if kind == "match":
        field, v = next(iter(body.items()))
        if isinstance(v, dict):
            return Match(
                field,
                v["query"],
                operator=v.get("operator", "or").lower(),
                minimum_should_match=v.get("minimum_should_match"),
                boost=v.get("boost", 1.0),
            )
        return Match(field, v)
    if kind == "match_phrase":
        field, v = next(iter(body.items()))
        if isinstance(v, dict):
            return MatchPhrase(field, v["query"], slop=v.get("slop", 0))
        return MatchPhrase(field, v)
    if kind == "match_phrase_prefix":
        field, v = next(iter(body.items()))
        if isinstance(v, dict):
            return MatchPhrasePrefix(
                field, v["query"], max_expansions=v.get("max_expansions", 50)
            )
        return MatchPhrasePrefix(field, v)
    if kind == "match_bool_prefix":
        field, v = next(iter(body.items()))
        if isinstance(v, dict):
            return MatchBoolPrefix(
                field,
                v["query"],
                operator=str(v.get("operator", "or")).lower(),
                minimum_should_match=v.get("minimum_should_match"),
                analyzer=v.get("analyzer"),
                fuzziness=v.get("fuzziness"),
                prefix_length=int(v.get("prefix_length", 0)),
                max_expansions=int(v.get("max_expansions", 50)),
            )
        return MatchBoolPrefix(field, v)
    if kind == "multi_match":
        fields = []
        for f in body["fields"]:
            if "^" in f:
                name, b = f.split("^", 1)
                fields.append((name, float(b)))
            else:
                fields.append((f, 1.0))
        mm_type = body.get("type", "best_fields")
        if mm_type == "bool_prefix":
            # MultiMatchQueryBuilder validation: these options are
            # meaningless for the bool_prefix type and are rejected
            for bad in ("slop", "cutoff_frequency"):
                if bad in body:
                    raise ValueError(
                        f"[{bad}] not allowed for type [bool_prefix]"
                    )
        return MultiMatch(
            body["query"],
            fields,
            type=mm_type,
            tie_breaker=body.get("tie_breaker", 0.0),
            operator=body.get("operator", "or").lower(),
            minimum_should_match=body.get("minimum_should_match"),
            analyzer=body.get("analyzer"),
            fuzziness=body.get("fuzziness"),
            prefix_length=int(body.get("prefix_length", 0)),
            max_expansions=int(body.get("max_expansions", 50)),
        )
    if kind == "more_like_this":
        return MoreLikeThis(
            like_ids=body["like"],
            field=body.get("field", "text"),
            max_query_terms=body.get("max_query_terms", 10),
            min_doc_freq=body.get("min_doc_freq", 2),
        )
    if kind == "function_score":
        fns = []
        for f in _aslist(body.get("functions")):
            fvf = None
            if "field_value_factor" in f:
                d = f["field_value_factor"]
                fvf = FieldValueFactor(
                    d["field"],
                    factor=d.get("factor", 1.0),
                    modifier=d.get("modifier", "none"),
                    missing=d.get("missing", 0.0),
                )
            fns.append(
                ScoreFunction(
                    filter=from_dict(f["filter"]) if "filter" in f else None,
                    weight=f.get("weight"),
                    field_value_factor=fvf,
                    gauss=f.get("gauss"),
                    exp=f.get("exp"),
                    linear=f.get("linear"),
                    random_score=f.get("random_score"),
                    script_score=f.get("script_score"),
                )
            )
        return FunctionScore(
            from_dict(body.get("query", {"match_all": {}})),
            functions=fns,
            score_mode=body.get("score_mode", "multiply"),
            boost_mode=body.get("boost_mode", "multiply"),
        )
    if kind == "intervals":
        field, v = next(iter(body.items()))

        def _ifilter(container):
            fd = container.get("filter")
            if not fd:
                return None
            (rel, fsrc), = fd.items()
            if rel == "script":
                raise ValueError("intervals script filter is not supported")
            return (rel, from_dict({"intervals": {field: fsrc}}))

        src = next(iter(v))
        if src == "match":
            m = v["match"]
            return Intervals(
                field,
                m["query"],
                max_gaps=m.get("max_gaps", -1),
                # `mode: ordered|unordered` is the 1.3+ spelling of the
                # ordered flag (IntervalMode.java)
                ordered=m.get("ordered", m.get("mode") == "ordered"),
                filter=_ifilter(m),
            )
        # any_of / all_of composition: each sub-interval is a match
        # source or a one-level any_of of match sources
        def _group(sub) -> List[Any]:
            # group members are terms (str) or unexpanded multi-term
            # source markers (dict) — the executor expands markers
            # against the term dictionary at compile time
            # (IntervalsSourceProvider Prefix/Wildcard sources)
            k = next(iter(sub))
            if k == "match":
                return sub["match"]["query"].split()
            if k == "prefix":
                p = sub["prefix"]
                return [{"prefix": p["prefix"] if isinstance(p, dict) else p}]
            if k == "wildcard":
                w = sub["wildcard"]
                return [{"wildcard": w.get("pattern") if isinstance(w, dict) else w}]
            if k == "fuzzy":
                fz = sub["fuzzy"]
                if isinstance(fz, dict):
                    return [{"fuzzy": fz["term"], "fuzziness": fz.get("fuzziness")}]
                return [{"fuzzy": fz, "fuzziness": None}]
            if k == "regexp":
                r = sub["regexp"]
                pat = r.get("pattern") if isinstance(r, dict) else r
                if isinstance(r, dict) and r.get("case_insensitive"):
                    pat = "(?i)" + pat
                return [{"regexp": pat}]
            if k == "any_of":
                out: List[Any] = []
                for s2 in sub["any_of"]["intervals"]:
                    out.extend(_group(s2))
                return out
            raise ValueError(f"unsupported intervals source: {k}")

        if src == "any_of":
            return Intervals(
                field,
                any_of_groups=[_group(v)],
                max_gaps=-1,
                ordered=False,
            )
        if src in ("prefix", "wildcard", "fuzzy", "regexp"):
            return Intervals(
                field, any_of_groups=[_group(v)], max_gaps=-1, ordered=False
            )
        a = v["all_of"]
        return Intervals(
            field,
            any_of_groups=[_group(s) for s in a["intervals"]],
            max_gaps=a.get("max_gaps", -1),
            ordered=a.get("ordered", a.get("mode") == "ordered"),
            filter=_ifilter(a),
        )
    if kind == "span_near":

        def _span_clause(c):
            # -> (term | marker dict | FieldMaskingSpan, field_or_None)
            ck = next(iter(c))
            if ck == "span_term":
                f = next(iter(c["span_term"]))
                return c["span_term"][f], f
            if ck == "span_multi":
                inner = from_dict(c["span_multi"]["match"])
                if isinstance(inner, Prefix):
                    return {"prefix": inner.value}, inner.field
                if isinstance(inner, Wildcard):
                    return {"wildcard": inner.value}, inner.field
                if isinstance(inner, Regexp):
                    return {"regexp": inner.value}, inner.field
                if isinstance(inner, Fuzzy):
                    return {"fuzzy": inner.value, "fuzziness": inner.fuzziness}, inner.field
                raise ValueError(f"span_multi cannot wrap {type(inner)}")
            if ck == "field_masking_span":
                fm = c["field_masking_span"]
                st = fm["query"]["span_term"]
                sfield = next(iter(st))
                return (
                    FieldMaskingSpan(fm["field"], sfield, st[sfield]),
                    fm["field"],
                )
            if ck == "span_gap":
                # {"span_gap": {field: width}} — a fixed-width hole in
                # the clause sequence (SpanNearQueryBuilder.java:315-318)
                gf = next(iter(c["span_gap"]))
                return _Gap(int(c["span_gap"][gf])), gf
            raise ValueError(f"unsupported span_near clause: {ck}")

        parsed = [_span_clause(c) for c in body["clauses"]]
        field = next(f for _, f in parsed if f is not None)
        # fold span_gap pseudo-clauses into per-adjacency gap widths
        terms: list = []
        gaps: list = []
        pending = 0
        for t, _f in parsed:
            if isinstance(t, _Gap):
                pending += t.width
                continue
            if terms:
                gaps.append(pending)
            elif pending:
                raise ValueError("span_gap before the first span clause is unsupported")
            pending = 0
            terms.append(t)
        if pending:
            raise ValueError("span_gap after the last span clause is unsupported")
        if not terms:
            raise ValueError("span_near needs at least one non-gap clause")
        if any(gaps) and not body.get("in_order", True):
            raise ValueError("span_gap requires in_order=true (SpanNearQuery.addGap)")
        return SpanNear(
            field,
            terms,
            slop=body.get("slop", 0),
            in_order=body.get("in_order", True),
            gaps=gaps if any(gaps) else None,
        )
    if kind == "span_multi":
        inner = from_dict(body["match"])
        return SpanMulti(getattr(inner, "field", "text"), inner)
    if kind == "field_masking_span":
        st = body["query"]["span_term"]
        sfield = next(iter(st))
        return FieldMaskingSpan(body["field"], sfield, st[sfield])
    if kind == "span_or":
        clauses = [c["span_term"] for c in body["clauses"]]
        field = next(iter(clauses[0]))
        return SpanOr(field, [c[field] for c in clauses])
    if kind == "span_not":
        inc = body["include"]["span_term"]
        field = next(iter(inc))
        exc = body["exclude"]
        exc_clauses = (
            [c["span_term"] for c in exc["span_or"]["clauses"]]
            if "span_or" in exc
            else [exc["span_term"]]
        )
        return SpanNot(
            field,
            inc[field],
            [c[field] for c in exc_clauses],
            pre=body.get("pre", 0),
            post=body.get("post", 0),
        )
    if kind == "span_first":
        m = body["match"]["span_term"]
        field = next(iter(m))
        return SpanFirst(field, m[field], end=body["end"])
    if kind in ("span_containing", "span_within"):
        big = body["big"]["span_near"]
        clauses = [c["span_term"] for c in big["clauses"]]
        field = next(iter(clauses[0]))
        little = body["little"]["span_term"][field]
        cls = SpanContaining if kind == "span_containing" else SpanWithin
        return cls(
            field,
            [c[field] for c in clauses],
            little,
            big_slop=big.get("slop", 0),
            big_in_order=big.get("in_order", True),
        )
    if kind == "simple_query_string":
        from opensearch_spark.query.querystring import parse_simple_query_string

        fields = []
        for f in body.get("fields", ["text"]):
            if "^" in f:
                name, b = f.split("^", 1)
                fields.append((name, float(b)))
            else:
                fields.append((f, 1.0))
        return parse_simple_query_string(
            body["query"],
            fields=fields,
            default_operator=body.get("default_operator", "or").lower(),
        )
    if kind == "distance_feature":
        return DistanceFeature(
            body["field"], body["origin"], body["pivot"], boost=body.get("boost", 1.0)
        )
    if kind == "rank_feature":
        # {"rank_feature": {"field": f, "log": {"scaling_factor": 4}}} /
        # {"saturation": {"pivot": p}} / {"sigmoid": {"pivot": p,
        # "exponent": e}} — function key optional (saturation default),
        # RankFeatureQueryBuilder.java PARSER
        fn = next((k for k in ("log", "saturation", "sigmoid") if k in body), "saturation")
        p = body.get(fn, {}) or {}
        return RankFeature(
            body["field"],
            function=fn,
            pivot=p.get("pivot"),
            scaling_factor=p.get("scaling_factor", 1.0),
            exponent=p.get("exponent", 1.0),
            boost=body.get("boost", 1.0),
        )
    if kind == "script_score":
        s = body.get("script")
        if isinstance(s, dict):
            return ScriptScore(
                from_dict(body["query"]), expr=s.get("source"),
                lang=s.get("lang"), params=s.get("params"),
            )
        return ScriptScore(from_dict(body["query"]), expr=s)
    if kind == "script":
        # {"script": {"script": {"source": "..."}}} (ScriptQueryBuilder.java)
        s = body.get("script", body)
        if isinstance(s, dict):
            return ScriptQuery(
                expr=s["source"], boost=body.get("boost", 1.0),
                lang=s.get("lang"), params=s.get("params"),
            )
        return ScriptQuery(expr=str(s), boost=body.get("boost", 1.0))
    if kind == "common":
        # {"common": {field: {"query": ..., "cutoff_frequency": ...}}}
        field = next(k for k in body if k not in ("boost", "_name"))
        b = body[field]
        if isinstance(b, str):
            return CommonTerms(field, b, boost=body.get("boost", 1.0))
        return CommonTerms(
            field,
            b["query"],
            cutoff_frequency=float(b.get("cutoff_frequency", 0.01)),
            low_freq_operator=str(b.get("low_freq_operator", "or")).lower(),
            high_freq_operator=str(b.get("high_freq_operator", "or")).lower(),
            minimum_should_match=b.get("minimum_should_match"),
            boost=float(b.get("boost", body.get("boost", 1.0))),
        )
    if kind == "geo_distance":
        # {"geo_distance": {"distance": "200km", "location": {"lat": .., "lon": ..}}}
        km = parse_distance_km(body["distance"])
        _gd_opts = {
            "distance", "distance_type", "validation_method",
            "ignore_unmapped", "_name", "boost",
        }
        field = next(k for k in body if k not in _gd_opts)
        pt = body[field]
        return GeoDistance(field, float(pt["lat"]), float(pt["lon"]), km)
    if kind == "geo_bounding_box":
        _gbb_opts = {"validation_method", "type", "ignore_unmapped", "_name", "boost"}
        field = next(k for k in body if k not in _gbb_opts)
        box = body[field]
        tl, br = box["top_left"], box["bottom_right"]
        return GeoBoundingBox(
            field,
            top=float(tl["lat"]),
            left=float(tl["lon"]),
            bottom=float(br["lat"]),
            right=float(br["lon"]),
        )
    if kind == "geo_polygon":
        # {"geo_polygon": {field: {"points": [{"lat":..,"lon":..} |
        #  [lon, lat] | "lat,lon", ...]}}} (GeoPolygonQueryBuilder.java;
        #  GeoUtils.parseGeoPoint accepts all three vertex encodings)
        _gp_opts = {"validation_method", "ignore_unmapped", "_name", "boost"}
        field = next(k for k in body if k not in _gp_opts)

        def _vertex(p) -> Tuple[float, float]:
            if isinstance(p, dict):
                return float(p["lat"]), float(p["lon"])
            if isinstance(p, str):
                la, lo = p.split(",")
                return float(la), float(lo)
            lo, la = p  # GeoJSON-style [lon, lat] array
            return float(la), float(lo)

        pts = [_vertex(p) for p in body[field]["points"]]
        if pts and pts[0] == pts[-1]:
            pts = pts[:-1]  # accept a pre-closed ring
        if len(pts) < 3:
            raise ValueError("geo_polygon needs at least 3 distinct points")
        return GeoPolygon(field, pts, boost=float(body.get("boost", 1.0)))
    if kind == "geo_shape":
        # {"geo_shape": {field: {"shape": {"type": ..., "coordinates":
        #  ...}, "relation": "intersects"}}} (GeoShapeQueryBuilder.java;
        #  shape grammar per ShapeBuilder / GeoJson.java)
        _gs_opts = {"relation", "ignore_unmapped", "_name", "boost"}
        field = next(k for k in body if k not in _gs_opts)
        b = body[field]
        relation = str(b.get("relation", "intersects")).lower()
        if relation not in ("intersects", "within", "disjoint", "contains"):
            raise ValueError(f"unknown geo_shape relation: {relation}")
        if "indexed_shape" in b:
            return GeoShape(
                field, shape=None, relation=relation,
                boost=body.get("boost", 1.0),
                indexed_shape=b["indexed_shape"],
            )
        shape = b["shape"]
        _validate_shape(shape)
        return GeoShape(
            field, shape, relation, boost=float(body.get("boost", 1.0))
        )
    if kind == "wrapper":
        import base64 as _b64
        import json as _json

        return from_dict(_json.loads(_b64.b64decode(body["query"])))
    if kind == "query_string":
        from opensearch_spark.query.querystring import parse_query_string

        return parse_query_string(
            body["query"] if isinstance(body, dict) else body,
            default_field=body.get("default_field", "text") if isinstance(body, dict) else "text",
            default_operator=body.get("default_operator", "or").lower()
            if isinstance(body, dict)
            else "or",
        )
    if kind == "match_all":
        return MatchAll(boost=body.get("boost", 1.0) if body else 1.0)
    if kind == "match_none":
        return MatchNone()
    if kind == "term":
        field, v = next(iter(body.items()))
        if isinstance(v, dict):
            return Term(field, v["value"], boost=v.get("boost", 1.0))
        return Term(field, v)
    if kind == "terms":
        field, vals = next(iter(body.items()))
        if isinstance(vals, dict):  # lookup form: {"id": ..., "path": ...}
            return TermsLookup(
                field, id=vals["id"], path=vals["path"],
                boost=vals.get("boost", 1.0),
            )
        return Terms(field, vals)
    if kind == "range":
        field, v = next(iter(body.items()))
        return Range(
            field,
            gt=v.get("gt"),
            gte=v.get("gte"),
            lt=v.get("lt"),
            lte=v.get("lte"),
        )
    if kind == "exists":
        return Exists(body["field"])
    if kind == "ids":
        return Ids([tuple(v) if isinstance(v, (list, tuple)) else (v,) for v in body["values"]])
    if kind == "prefix":
        field, v = next(iter(body.items()))
        return Prefix(field, v if isinstance(v, str) else v["value"])
    if kind == "wildcard":
        field, v = next(iter(body.items()))
        return Wildcard(field, v if isinstance(v, str) else v["value"])
    if kind == "regexp":
        field, v = next(iter(body.items()))
        return Regexp(field, v if isinstance(v, str) else v["value"])
    if kind == "fuzzy":
        field, v = next(iter(body.items()))
        if isinstance(v, dict):
            return Fuzzy(
                field,
                v["value"],
                fuzziness=v.get("fuzziness"),
                prefix_length=int(v.get("prefix_length", 0)),
                max_expansions=int(v.get("max_expansions", 50)),
                transpositions=bool(v.get("transpositions", True)),
            )
        return Fuzzy(field, v)
    if kind == "knn":
        field, v = next(iter(body.items()))
        return Knn(
            field,
            vector=[float(x) for x in v["vector"]],
            k=int(v.get("k", 10)),
            filter=from_dict(v["filter"]) if v.get("filter") else None,
            space_type=v.get("space_type", "cosinesimil"),
            boost=float(v.get("boost", 1.0)),
        )
    if kind == "bool":
        return Bool(
            must=[from_dict(q) for q in _aslist(body.get("must"))],
            filter=[from_dict(q) for q in _aslist(body.get("filter"))],
            should=[from_dict(q) for q in _aslist(body.get("should"))],
            must_not=[from_dict(q) for q in _aslist(body.get("must_not"))],
            minimum_should_match=body.get("minimum_should_match"),
        )
    if kind == "constant_score":
        return ConstantScore(from_dict(body["filter"]), boost=body.get("boost", 1.0))
    if kind == "dis_max":
        return DisMax(
            [from_dict(q) for q in body["queries"]],
            tie_breaker=body.get("tie_breaker", 0.0),
        )
    if kind == "boosting":
        return Boosting(
            from_dict(body["positive"]),
            from_dict(body["negative"]),
            negative_boost=body.get("negative_boost", 0.5),
        )
    raise ValueError(f"unsupported query kind: {kind}")


def _aslist(x) -> List:
    if x is None:
        return []
    if isinstance(x, dict):
        return [x]
    return list(x)
