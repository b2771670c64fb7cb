"""Dynamic mapping inference: raw JSON docs -> typed mappings -> index.

Reference semantics (all public OpenSearch source):

- ``index/mapper/DocumentParser.java:711-829``
  (``createBuilderFromDynamicValue``): JSON ints -> ``long``; JSON
  decimals -> ``float`` ("much more space-efficient ... enough most of
  the time"); JSON booleans -> ``boolean``; strings -> ``long``/
  ``float`` only when ``numeric_detection`` is on (default OFF), else a
  date when ``date_detection`` is on (default ON) and one of the
  ``dynamic_date_formats`` matches — pure numbers are refused as dates
  — else ``text`` with a ``keyword`` multi-field (``ignore_above:
  256``).
- ``DocumentParser.java:534-566`` (``parseObject``): unmapped field
  under ``dynamic: strict`` -> ``StrictDynamicMappingException``;
  ``dynamic: false`` -> the subtree is skipped (kept in ``_source``,
  not indexed); ``dynamic: true`` -> a dynamic mapper is added.
- ``DocumentParser.java:228-246`` (``createDynamicUpdate``) +
  ``MapperService`` merge: the per-doc dynamic mappers are merged into
  the index mapping; a type change on merge is rejected.

Batch-parallel deviation (documented): the reference streams docs one
at a time, so the FIRST doc to mention a field wins the type and later
conflicting docs fail per-doc.  A distributed batch has no meaningful
"first", so inference here resolves each path with an order-free
union lattice instead:

- ``long ∪ float -> float``  (lossless numeric widening),
- ``anything-scalar ∪ text -> text``  (strings index every value; this
  is also what the reference's coercing mappers accept in practice —
  ``NumberFieldMapper`` parses numeric strings, ``BooleanFieldMapper``
  parses "true"/"false"),
- ``date ∪ date`` with different formats -> formats unioned with
  ``||`` (``DateFieldMapper`` multi-format),
- ``boolean ∪ long``, ``date ∪ long``, ``object ∪ scalar`` ->
  ``MappingConflictError`` (the reference's merge rejects these type
  changes too).

Every inferred mapping indexes every input document — the
deterministic, scale-correct choice for a 10^12-row batch, and
independent of partitioning / arrival order.

Scale shape: inference is a tree-fold — each Arrow batch reduces to ONE
partial mapping tree (bytes, not rows), partial trees combine in a
salted two-level ``applyInPandas`` reduction, and only ~64 small JSON
trees ever reach the driver.  No per-row Python outside the
Arrow-batched UDF, no full-data collect.
"""

from __future__ import annotations

import json
import os
import re
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


class MappingConflictError(ValueError):
    """Two docs imply irreconcilable types for one path (the analog of
    MapperService's "mapper [f] cannot be changed from type [a] to
    [b]" merge rejection)."""


class StrictDynamicMappingError(ValueError):
    """An unmapped field arrived under ``dynamic: strict``
    (StrictDynamicMappingException)."""


# --------------------------------------------------------------- detection

# dynamic_date_formats default: ["strict_date_optional_time",
# "yyyy/MM/dd HH:mm:ss||yyyy/MM/dd||epoch_millis"]
# (RootObjectMapper.java Defaults.DYNAMIC_DATE_TIME_FORMATTERS).
# epoch_millis never fires in detection because DocumentParser refuses
# strings parseable as long/double (":747-751 'We refuse to match pure
# numbers'"), so the regex set below covers exactly the reachable ones.
_DATE_PATTERNS: List[Tuple[str, re.Pattern]] = [
    (
        "strict_date_optional_time",
        re.compile(
            r"^\d{4}-\d{2}-\d{2}"
            r"([T ]\d{2}:\d{2}(:\d{2}(\.\d{1,9})?)?"
            r"([Zz]|[+-]\d{2}:?\d{2})?)?$"
        ),
    ),
    (
        "yyyy/MM/dd HH:mm:ss",
        re.compile(r"^\d{4}/\d{2}/\d{2} \d{2}:\d{2}:\d{2}$"),
    ),
    ("yyyy/MM/dd", re.compile(r"^\d{4}/\d{2}/\d{2}$")),
]

_LONG_RE = re.compile(r"^[+-]?\d+$")
# Double.parseDouble accepts a superset; this covers the JSON-plausible
# shapes (decimal, exponent, leading sign)
_DOUBLE_RE = re.compile(r"^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$")

_TEXT_SPEC = {
    "type": "text",
    "fields": {"keyword": {"type": "keyword", "ignore_above": 256}},
}

# union lattice over scalar types; keys are frozensets of two distinct
# types, value = joined type (absent pair -> conflict)
_JOIN = {
    frozenset(("long", "float")): "float",
    frozenset(("long", "text")): "text",
    frozenset(("float", "text")): "text",
    frozenset(("boolean", "text")): "text",
    frozenset(("date", "text")): "text",
    # an EXPLICIT scaled_float mapping (never inferred) absorbs the
    # long/float the dynamic pass infers from incoming numeric JSON
    frozenset(("scaled_float", "long")): "scaled_float",
    frozenset(("scaled_float", "float")): "scaled_float",
    # likewise an explicit constant_keyword absorbs the inferred text
    frozenset(("constant_keyword", "text")): "constant_keyword",
    # an explicit ip mapping absorbs the text the dynamic pass infers
    frozenset(("ip", "text")): "ip",
    frozenset(("match_only_text", "text")): "match_only_text",
    frozenset(("wildcard", "text")): "wildcard",
    # an explicit keyword mapping absorbs inferred text (exact-value
    # semantics win; KeywordFieldMapper indexes the raw string)
    frozenset(("keyword", "text")): "keyword",
    # explicit numeric-variant mappings absorb what dynamic inference
    # sees in the raw JSON
    frozenset(("half_float", "float")): "half_float",
    frozenset(("half_float", "long")): "half_float",
    frozenset(("unsigned_long", "long")): "unsigned_long",
    frozenset(("unsigned_long", "float")): "unsigned_long",
    frozenset(("date_nanos", "text")): "date_nanos",
    frozenset(("date_nanos", "date")): "date_nanos",
    # an explicit geo_point absorbs the [lon, lat] arrays (inferred as
    # float arrays) and the "lat,lon" strings dynamic inference sees
    frozenset(("geo_point", "float")): "geo_point",
    frozenset(("geo_point", "long")): "geo_point",
    frozenset(("geo_point", "text")): "geo_point",
    # base64 payloads infer as text; the explicit binary mapping wins
    frozenset(("binary", "text")): "binary",
}


# reference numeric-family aliases that share our storage type (the
# narrower java widths have no distinct parquet representation here)
_TYPE_ALIASES = {"integer": "long", "short": "long", "byte": "long",
                 "double": "float"}


def _normalize_types(props: dict) -> dict:
    out = {}
    for k, spec in props.items():
        if isinstance(spec, dict):
            spec = dict(spec)
            t = spec.get("type")
            if t in _TYPE_ALIASES:
                spec["type"] = _TYPE_ALIASES[t]
            if isinstance(spec.get("properties"), dict):
                spec["properties"] = _normalize_types(spec["properties"])
        out[k] = spec
    return out


def _infer_scalar(
    v,
    date_detection: bool = True,
    numeric_detection: bool = False,
) -> Optional[dict]:
    """Type spec for one JSON scalar (createBuilderFromDynamicValue).

    Returns None for JSON null (no mapping is ever created from a
    null — the reference just skips the value)."""
    if v is None:
        return None
    if isinstance(v, bool):  # before int: bool is an int subclass
        return {"type": "boolean"}
    if isinstance(v, int):
        return {"type": "long"}
    if isinstance(v, float):
        return {"type": "float"}
    if isinstance(v, str):
        is_long = bool(_LONG_RE.match(v))
        is_dbl = bool(_DOUBLE_RE.match(v))
        if numeric_detection and is_long:
            return {"type": "long"}
        if numeric_detection and is_dbl:
            return {"type": "float"}
        if date_detection and not is_long and not is_dbl:
            for fmt, pat in _DATE_PATTERNS:
                if pat.match(v):
                    return {"type": "date", "format": fmt}
        return json.loads(json.dumps(_TEXT_SPEC))
    raise MappingConflictError(f"unmappable JSON scalar {type(v).__name__}")


def _join_specs(a: dict, b: dict, path: str) -> dict:
    """Order-free union of two field specs at one path."""
    ta, tb = a["type"], b["type"]
    if ta == "object" or tb == "object":
        if ta == tb:
            out = {"type": "object", "properties": dict(a.get("properties", {}))}
            for k, spec in b.get("properties", {}).items():
                sub = out["properties"].get(k)
                out["properties"][k] = (
                    _join_specs(sub, spec, f"{path}.{k}" if path else k)
                    if sub
                    else spec
                )
            if a.get("_array") or b.get("_array"):
                out["_array"] = True
            return out
        raise MappingConflictError(
            f"can't merge a non-object mapping [{path}] with an object mapping"
        )
    if ta == tb:
        out = dict(a)
        if ta == "date" and a.get("format") != b.get("format"):
            fmts = list(dict.fromkeys(
                a.get("format", "").split("||") + b.get("format", "").split("||")
            ))
            out["format"] = "||".join(f for f in fmts if f)
        if b.get("_array"):
            out["_array"] = True
        return out
    joined = _JOIN.get(frozenset((ta, tb)))
    if joined is None:
        raise MappingConflictError(
            f"mapper [{path}] cannot be changed from type [{ta}] to [{tb}]"
        )
    if joined == ta:
        out = dict(a)  # keep the winning side's params (scaling_factor)
    elif joined == tb:
        out = dict(b)
    else:
        out = (json.loads(json.dumps(_TEXT_SPEC)) if joined == "text"
               else {"type": joined})
    if a.get("_array") or b.get("_array"):
        out["_array"] = True
    return out


def infer_doc(
    doc: dict,
    date_detection: bool = True,
    numeric_detection: bool = False,
    _path: str = "",
) -> dict:
    """Properties tree for ONE parsed JSON document."""
    props: Dict[str, dict] = {}
    for k, v in doc.items():
        p = f"{_path}.{k}" if _path else k
        arr = isinstance(v, list)
        if arr:
            # element-wise union (OpenSearch has no array type: any
            # field may be multi-valued; first non-null element family
            # drives the type, conflicting elements conflict here too)
            spec = None
            for el in v:
                s = (
                    {"type": "object",
                     "properties": infer_doc(el, date_detection,
                                             numeric_detection, p)}
                    if isinstance(el, dict)
                    else _infer_scalar(el, date_detection, numeric_detection)
                )
                if s is None:
                    continue
                spec = s if spec is None else _join_specs(spec, s, p)
            if spec is None:
                continue
            spec["_array"] = True
        elif isinstance(v, dict):
            spec = {
                "type": "object",
                "properties": infer_doc(v, date_detection, numeric_detection, p),
            }
        else:
            spec = _infer_scalar(v, date_detection, numeric_detection)
            if spec is None:
                continue
        prev = props.get(k)
        props[k] = _join_specs(prev, spec, p) if prev else spec
    return props


def merge_properties(a: dict, b: dict, _path: str = "") -> dict:
    """Union of two properties trees (order-free)."""
    out = dict(a)
    for k, spec in b.items():
        p = f"{_path}.{k}" if _path else k
        out[k] = _join_specs(out[k], spec, p) if k in out else spec
    return out


# --------------------------------------------------------------- Mappings


class Mappings:
    """An index's mappings: a properties tree + dynamic mode.

    ``to_dict()`` emits the reference's GET ``_mapping`` response shape
    (``{"dynamic": ..., "properties": {...}}``); internal ``_array``
    annotations (Spark needs them for the read schema; the reference
    has no array type) are stripped from that view.
    """

    def __init__(self, properties: Optional[dict] = None, dynamic: str = "true"):
        if dynamic not in ("true", "false", "strict"):
            raise ValueError(f"dynamic must be true|false|strict, got {dynamic!r}")
        self.properties: dict = _normalize_types(properties or {})
        self.dynamic = dynamic

    # -------------------------------------------------- construction

    @classmethod
    def from_dict(cls, d: dict) -> "Mappings":
        return cls(d.get("properties", {}), str(d.get("dynamic", "true")))

    def merge(self, new_props: dict) -> "Mappings":
        """Merge dynamically-discovered properties per the dynamic mode
        (DocumentParser.parseObject:534-566 + createDynamicUpdate).

        - ``true``: new paths are added, overlapping paths conflict-
          checked through the union lattice;
        - ``false``: new paths are DROPPED (not indexed; callers keep
          them in ``_source`` only), overlapping paths must still be
          type-compatible;
        - ``strict``: any new top-level-or-nested path raises
          ``StrictDynamicMappingError``.
        """
        if self.dynamic == "true":
            return Mappings(merge_properties(self.properties, new_props),
                            self.dynamic)
        kept = _restrict(new_props, self.properties, strict=self.dynamic == "strict")
        return Mappings(merge_properties(self.properties, kept), self.dynamic)

    # -------------------------------------------------- views

    def to_dict(self) -> dict:
        return {"dynamic": self.dynamic, "properties": _strip(self.properties)}

    def flat(self) -> Dict[str, dict]:
        """Dotted-path -> leaf spec (objects recursed through)."""
        out: Dict[str, dict] = {}

        def walk(props: dict, prefix: str):
            for k, spec in props.items():
                p = f"{prefix}.{k}" if prefix else k
                if spec["type"] == "object":
                    walk(spec.get("properties", {}), p)
                else:
                    out[p] = spec

        walk(self.properties, "")
        return out

    def spark_schema(self) -> T.StructType:
        """Read schema for ``from_json``.

        ``float`` maps to Spark DOUBLE on purpose: the mapping TYPE
        follows the reference's space-saving ``float`` default, but
        parsing the JSON text through float32 would throw away digits
        the source had — parquet storage here is columnar either way.
        ``date`` parses as STRING and is converted post-parse with
        ``to_timestamp`` per matched format (from_json's TimestampType
        can't take per-field multi-formats)."""
        return T.StructType([_field(k, s) for k, s in self.properties.items()])

    def date_fields(self) -> Dict[str, List[str]]:
        """Dotted path -> format list, for post-parse conversion."""
        return {
            p: s.get("format", "strict_date_optional_time").split("||")
            for p, s in self.flat().items()
            if s["type"] == "date"
        }

    def geo_fields(self) -> List[str]:
        return sorted(
            p for p, s in self.flat().items() if s["type"] == "geo_point"
        )

    def nanos_fields(self) -> Dict[str, List[str]]:
        """Dotted path -> format list for date_nanos columns."""
        return {
            p: s.get("format", "strict_date_optional_time").split("||")
            for p, s in self.flat().items()
            if s["type"] == "date_nanos"
        }

    def text_fields(self) -> List[str]:
        return sorted(
            p for p, s in self.flat().items()
            if s["type"] in ("text", "match_only_text")
        )

    def scaled_fields(self) -> Dict[str, float]:
        """Dotted path -> scaling_factor for ``scaled_float`` fields
        (ScaledFloatFieldMapper: stored value = round(v * factor) as a
        long; queries scale their operands the same way)."""
        return {
            p: float(s.get("scaling_factor", 100.0))
            for p, s in self.flat().items()
            if s["type"] == "scaled_float"
        }

    def constant_fields(self) -> Dict[str, str]:
        """Dotted path -> constant for ``constant_keyword`` fields
        (ConstantKeywordFieldMapper: queries resolve at plan time to
        match-all / match-none against the mapping constant)."""
        return {
            p: str(s.get("value", ""))
            for p, s in self.flat().items()
            if s["type"] == "constant_keyword"
        }

    def ip_fields(self) -> List[str]:
        """Dotted paths of ``ip`` fields."""
        return sorted(
            p for p, s in self.flat().items() if s["type"] == "ip"
        )


def _strip(props: dict) -> dict:
    out = {}
    for k, spec in props.items():
        s = {kk: vv for kk, vv in spec.items() if not kk.startswith("_")}
        if s.get("type") == "object":
            s["properties"] = _strip(s.get("properties", {}))
        out[k] = s
    return out


def _restrict(new: dict, existing: dict, strict: bool, _path: str = "") -> dict:
    """Drop (dynamic=false) or reject (strict) paths absent from
    ``existing``; keep overlaps for the type-compat check."""
    out = {}
    for k, spec in new.items():
        p = f"{_path}.{k}" if _path else k
        if k not in existing:
            if strict:
                raise StrictDynamicMappingError(
                    f"mapping set to strict, dynamic introduction of [{p}] "
                    "within [_doc] is not allowed"
                )
            continue
        if spec["type"] == "object" and existing[k].get("type") == "object":
            kept = _restrict(spec.get("properties", {}),
                             existing[k].get("properties", {}), strict, p)
            out[k] = {"type": "object", "properties": kept}
            if spec.get("_array"):
                out[k]["_array"] = True
        else:
            out[k] = spec
    return out


_SPARK_SCALAR = {
    "long": T.LongType(),
    "float": T.DoubleType(),
    # scaled_float parses as double from JSON; typed_frame then stores
    # round(v * scaling_factor) as long (ScaledFloatFieldMapper.java:433)
    "scaled_float": T.DoubleType(),
    # constant_keyword parses as string; typed_frame validates each doc
    # against the mapping constant and stores the constant
    # (ConstantKeywordFieldMapper.java:164-179)
    "constant_keyword": T.StringType(),
    # ip parses as string; typed_frame canonicalizes to the 32-hex-char
    # v6-mapped form whose LEXICOGRAPHIC order equals numeric address
    # order (IpFieldMapper stores v6-mapped 16-byte points)
    "ip": T.StringType(),
    # match_only_text analyzes like text; its DOCS-only scoring is the
    # engine's match_only similarity (MatchOnlyTextFieldMapper.java)
    "match_only_text": T.StringType(),
    # wildcard accepts keyword-shaped strings; query results equal the
    # keyword column semantics (WildcardFieldMapper's ngram-accelerated
    # LAYOUT is an index concern the parquet scan stands in for)
    "wildcard": T.StringType(),
    # half_float parses as double; typed_frame quantizes through
    # binary16 (HalfFloatPoint semantics: stored/sorted values are the
    # nearest half-precision number, _source stays verbatim)
    "half_float": T.DoubleType(),
    # unsigned_long holds the full 0..2^64-1 domain (UnsignedLongField
    # is a 64-bit unsigned point); decimal(20,0) preserves magnitude
    # and ordering beyond int64
    "unsigned_long": T.DecimalType(20, 0),
    # date_nanos parses as string; typed_frame converts to epoch-NANOS
    # longs (DateFieldMapper.Resolution.NANOSECONDS doc values), which
    # is also the sort/search_after representation
    "date_nanos": T.StringType(),
    # binary stores base64 strings verbatim (BinaryFieldMapper); not
    # searchable, exists/fetch only
    "binary": T.StringType(),
    # geo_point accepts the GeoJSON-style [lon, lat] array form;
    # typed_frame derives the engine's <field>_lat/<field>_lon column
    # pair from it (string/object/geohash forms are a documented gap)
    "geo_point": T.ArrayType(T.DoubleType()),
    "boolean": T.BooleanType(),
    "date": T.StringType(),
    "text": T.StringType(),
    "keyword": T.StringType(),
}


def _field(name: str, spec: dict) -> T.StructField:
    if spec["type"] == "object":
        dt: T.DataType = T.StructType(
            [_field(k, s) for k, s in spec.get("properties", {}).items()]
        )
    else:
        dt = _SPARK_SCALAR[spec["type"]]
    # geo_point's scalar type IS the [lon, lat] array — never re-wrap
    if spec.get("_array") and spec["type"] != "geo_point":
        dt = T.ArrayType(dt)
    return T.StructField(name, dt, True)


# ------------------------------------------------------- distributed infer


def infer_mappings(
    df: DataFrame,
    json_col: str = "_source",
    date_detection: bool = True,
    numeric_detection: bool = False,
    combine_partitions: int = 64,
) -> Mappings:
    """Infer mappings over a DataFrame of raw JSON document strings.

    Tree-fold shape (scales to 10^12 docs): every Arrow batch folds its
    docs into ONE partial properties tree (``mapInPandas``), partial
    trees pre-combine inside ``combine_partitions`` salted groups
    (``applyInPandas``), and the driver merges only the ~64 surviving
    trees.  Unparseable rows raise — same as the reference's per-doc
    mapping exception on malformed JSON."""
    dd, nd = bool(date_detection), bool(numeric_detection)

    def fold_batches(it: Iterator) -> Iterator:
        import pandas as pd

        acc: dict = {}
        for pdf in it:
            for s in pdf[json_col]:
                if s is None:
                    continue
                doc = json.loads(s)
                if not isinstance(doc, dict):
                    raise MappingConflictError("top-level JSON must be an object")
                acc = merge_properties(acc, infer_doc(doc, dd, nd))
        yield pd.DataFrame({"tree": [json.dumps(acc)]})

    def fold_trees(key, pdf):
        import pandas as pd

        acc: dict = {}
        for s in pdf["tree"]:
            acc = merge_properties(acc, json.loads(s))
        return pd.DataFrame({"tree": [json.dumps(acc)]})

    partials = df.select(F.col(json_col).alias(json_col)).mapInPandas(
        fold_batches, schema="tree string"
    )
    combined = (
        partials.withColumn(
            "g", (F.xxhash64(F.col("tree")) % combine_partitions).cast("int")
        )
        .groupBy("g")
        .applyInPandas(fold_trees, schema="tree string")
        .collect()
    )
    acc: dict = {}
    for row in combined:
        acc = merge_properties(acc, json.loads(row["tree"]))
    return Mappings(acc)


# ------------------------------------------------------- create from JSON


def typed_frame(
    df: DataFrame, mappings: Mappings, json_col: str = "_source",
    keep_cols: Sequence[str] = (),
) -> DataFrame:
    """Parse the JSON column into typed top-level columns per the
    mappings (+ ``_source`` retained verbatim, like the reference's
    stored ``_source`` field).  Fields absent from the mappings
    (dynamic=false leftovers) are simply not selected — they live on
    only inside ``_source``.  Date fields are converted to timestamps
    via their matched format list.  ``keep_cols`` pass through
    verbatim (external id columns living beside the JSON, the
    ``_id``-outside-``_source`` shape of the reference's index API)."""
    schema = mappings.spark_schema()
    out = df.withColumn("_parsed", F.from_json(F.col(json_col), schema))
    cols = [F.col(c) for c in keep_cols] + [
        F.col(json_col).alias("_source")
    ] + [
        F.col(f"_parsed.`{f.name}`").alias(f.name) for f in schema.fields
    ]
    out = out.select(*cols)
    _SPARK_FMT = {
        "strict_date_optional_time": None,  # Spark's default ISO parse
        "yyyy/MM/dd HH:mm:ss": "yyyy/MM/dd HH:mm:ss",
        "yyyy/MM/dd": "yyyy/MM/dd",
    }
    for path, fmts in mappings.date_fields().items():
        if "." in path:  # nested dates stay strings inside their struct
            continue
        conv = [
            F.to_timestamp(F.col(f"`{path}`"))
            if _SPARK_FMT.get(f) is None
            else F.to_timestamp(F.col(f"`{path}`"), _SPARK_FMT[f])
            for f in fmts
        ]
        out = out.withColumn(path, F.coalesce(*conv) if len(conv) > 1 else conv[0])
    # scaled_float storage transform: round(v * factor) as long — the
    # doc-values representation queries compare against
    for path, factor in mappings.scaled_fields().items():
        if "." in path:  # nested scaled floats stay raw in their struct
            continue
        out = out.withColumn(
            path, F.round(F.col(f"`{path}`") * F.lit(factor)).cast("long")
        )
    # ip canonicalization: 32-hex v6-mapped form (Arrow-batched; the
    # stdlib parser handles every textual form incl. IPv6 compression)
    ip_paths = [p for p in mappings.ip_fields() if "." not in p]
    if ip_paths:
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("string")
        def _ip_hex(s):
            return s.map(
                lambda v: None if v is None else ip_canonical_hex(v)
            )

        for path in ip_paths:
            out = out.withColumn(path, _ip_hex(F.col(f"`{path}`")))
    # half_float: quantize through binary16 (HalfFloatPoint encode/
    # decode round-trip) so stored/sorted/compared values carry
    # half precision while _source stays verbatim
    hf_paths = [
        p for p, s in mappings.flat().items()
        if s["type"] == "half_float" and "." not in p
    ]
    if hf_paths:
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("double")
        def _hf(s):
            import numpy as _np

            return s.astype("float64").astype(_np.float16).astype("float64")

        for path in hf_paths:
            out = out.withColumn(path, _hf(F.col(f"`{path}`")))
    # date_nanos: parsed strings -> epoch-NANOS longs (the resolution's
    # doc-values representation, also what sort/search_after emit)
    for path, fmts in mappings.nanos_fields().items():
        if "." in path:
            continue
        conv = []
        for f in fmts:
            if f == "strict_date_optional_time":
                conv.append(F.to_timestamp(F.col(f"`{path}`")))
            else:
                conv.append(F.to_timestamp(F.col(f"`{path}`"), f))
        ts = F.coalesce(*conv) if len(conv) > 1 else conv[0]
        # decimal(19,0), not long: epoch nanos exceed float64's exact
        # integer range and the builder's Arrow docmap round-trip
        # demotes int64 to float64 — decimals travel as exact objects
        out = out.withColumn(
            path,
            (F.unix_micros(ts) * F.lit(1000)).cast("decimal(19,0)"),
        )
    # geo_point: split the [lon, lat] array into the engine-wide
    # <field>_lat/<field>_lon column-pair convention
    for path in mappings.geo_fields():
        if "." in path:
            continue
        arr = F.col(f"`{path}`")
        out = out.withColumn(f"{path}_lat", arr.getItem(1))
        out = out.withColumn(f"{path}_lon", arr.getItem(0))
    # multi-fields (TextFieldMapper/DateFieldMapper `fields`): each
    # sub-field materializes as a LITERAL dotted column sharing the
    # parent's value under the sub-type's storage — keyword copies,
    # date_nanos converts the parent's timestamp to epoch nanos
    for parent, spec in (mappings.properties or {}).items():
        for sub, sspec in (spec.get("fields") or {}).items():
            if parent not in [f.name for f in out.schema.fields]:
                continue
            stype = sspec.get("type")
            # physical name is dot-mangled: applyInPandas addresses
            # columns via df[name], where a literal dot reads as a
            # struct extraction (query-side resolution un-mangles)
            name = f"{parent}__dot__{sub}"
            if stype == "date_nanos":
                pc = F.col(f"`{parent}`")
                ts = (pc.cast("timestamp")
                      if spec.get("type") in ("date", "date_nanos")
                      else F.to_timestamp(pc))
                out = out.withColumn(
                    name,
                    (F.unix_micros(ts) * F.lit(1000)).cast("decimal(19,0)"),
                )
            elif stype == "keyword":
                out = out.withColumn(name, F.col(f"`{parent}`").cast("string"))
    # constant_keyword: a doc carrying a DIFFERENT value is rejected
    # (ConstantKeywordFieldMapper.parseCreateField:176); absent values
    # take the constant
    for path, const in mappings.constant_fields().items():
        if "." in path:
            continue
        c = F.col(f"`{path}`")
        out = out.withColumn(
            path,
            F.when(
                c.isNotNull() & (c != F.lit(const)),
                F.raise_error(F.concat(
                    F.lit(f"constant keyword field [{path}] must have "
                          f"a value of [{const}], got ["), c, F.lit("]"),
                )),
            ).otherwise(F.lit(const)),
        )
    return out


def ip_canonical_hex(v: str) -> str:
    """Canonical 32-hex-char v6-mapped form of a textual IP: IPv4 maps
    into ::ffff:0:0/96 (IpFieldMapper's 16-byte encoding), so
    lexicographic order over the hex equals numeric address order and
    v4/v6 compare consistently."""
    import ipaddress

    a = ipaddress.ip_address(str(v).strip())
    n = int(a) if a.version == 6 else (0xFFFF << 32) | int(a)
    return format(n, "032x")


def ip_range_hex(cidr: str) -> tuple:
    """(first, last) canonical hex bounds of a CIDR block."""
    import ipaddress

    net = ipaddress.ip_network(str(cidr).strip(), strict=False)
    base = 0 if net.version == 6 else (0xFFFF << 32)
    lo = base | int(net.network_address)
    hi = base | int(net.broadcast_address)
    return format(lo, "032x"), format(hi, "032x")


def create_index_from_json(
    spark: SparkSession,
    df: DataFrame,
    index_dir: str,
    json_col: str = "_source",
    id_fields: Sequence[str] = ("doc_id",),
    text_field: Optional[str] = None,
    dynamic: str = "true",
    date_detection: bool = True,
    numeric_detection: bool = False,
    mappings: Optional[Mappings] = None,
    config=None,
):
    """Create-from-JSON: infer (or merge into) mappings, type the
    frame, build the inverted index, persist ``mappings.json``.

    Returns ``(engine_index_dir, Mappings)``.  ``text_field`` defaults
    to the field literally named ``text`` when it inferred as text,
    else the first text field in name order (deterministic)."""
    from opensearch_spark.index.builder import IndexConfig, build_index

    inferred = infer_mappings(df, json_col, date_detection, numeric_detection)
    base = mappings if mappings is not None else Mappings({}, dynamic)
    merged = base.merge(inferred.properties)

    tf = text_field
    if tf is None:
        # only TOP-LEVEL text fields can drive the postings build —
        # nested text lives inside a struct column the inverter cannot
        # address (callers index nested text via its own engine)
        texts = [t for t in merged.text_fields() if "." not in t]
        if not texts:
            raise ValueError("no text field inferred; pass text_field explicitly")
        tf = "text" if "text" in texts else texts[0]

    keep = [
        c for c in id_fields
        if c in df.columns and c not in merged.flat()
    ]
    typed = typed_frame(df, merged, json_col, keep_cols=keep)
    cfg = config or IndexConfig()
    import dataclasses as _dc

    cfg = _dc.replace(cfg, id_cols=tuple(id_fields), text_col=tf)
    build_index(spark, typed, index_dir, cfg)
    with open(os.path.join(index_dir, "mappings.json"), "w") as f:
        json.dump(merged.to_dict(), f, indent=1, sort_keys=True)
    return index_dir, merged


def get_mapping(index_dir: str) -> dict:
    """GET ``/<index>/_mapping`` analog."""
    with open(os.path.join(index_dir, "mappings.json")) as f:
        return json.load(f)
