"""Ingest pipelines: per-doc transform DAG applied before indexing
(``ingest/IngestService.java``; processors in
``modules/ingest-common/src/main/java/org/opensearch/ingest/common/``;
SURVEY.md §2.8).

Each processor is a 1:1 mapping onto ``pyspark.sql.functions`` — the
whole pipeline compiles to a single Catalyst projection chain, so at
100 TB it fuses into the ingest scan with zero extra passes.

Spec shape mirrors the reference JSON: a list of single-key dicts,
``[{"lowercase": {"field": "text"}}, {"split": {...}}, ...]``.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _proc_set(df, p):        # SetProcessor.java
    return df.withColumn(p["field"], F.lit(p["value"]))


def _proc_copy(df, p):       # CopyProcessor.java
    return df.withColumn(p["target_field"], F.col(p["field"]))


def _proc_rename(df, p):     # RenameProcessor.java
    return df.withColumnRenamed(p["field"], p["target_field"])


def _proc_remove(df, p):     # RemoveProcessor.java
    fields = p["field"] if isinstance(p["field"], list) else [p["field"]]
    return df.drop(*fields)


def _proc_lowercase(df, p):  # LowercaseProcessor.java
    return df.withColumn(p["field"], F.lower(F.col(p["field"])))


def _proc_uppercase(df, p):  # UppercaseProcessor.java
    return df.withColumn(p["field"], F.upper(F.col(p["field"])))


def _proc_trim(df, p):       # TrimProcessor.java
    return df.withColumn(p["field"], F.trim(F.col(p["field"])))


def _proc_gsub(df, p):       # GsubProcessor.java
    return df.withColumn(
        p["field"], F.regexp_replace(F.col(p["field"]), p["pattern"], p["replacement"])
    )


def _proc_split(df, p):      # SplitProcessor.java
    return df.withColumn(p["field"], F.split(F.col(p["field"]), p["separator"]))


def _proc_join(df, p):       # JoinProcessor.java
    return df.withColumn(p["field"], F.array_join(F.col(p["field"]), p["separator"]))


def _proc_convert(df, p):    # ConvertProcessor.java
    t = {"integer": "int", "long": "long", "float": "float", "double": "double",
         "string": "string", "boolean": "boolean"}[p["type"]]
    return df.withColumn(p.get("target_field", p["field"]), F.col(p["field"]).cast(t))


def _proc_date(df, p):       # DateProcessor.java
    fmt = p.get("format")
    tgt = p.get("target_field", "@timestamp")
    c = F.col(p["field"])
    return df.withColumn(tgt, F.to_timestamp(c, fmt) if fmt else F.to_timestamp(c))


def _proc_json(df, p):       # JsonProcessor.java
    return df.withColumn(
        p.get("target_field", p["field"]),
        F.from_json(F.col(p["field"]), p["schema"]),
    )


def _proc_kv(df, p):         # KeyValueProcessor.java
    return df.withColumn(
        p.get("target_field", p["field"]),
        F.str_to_map(
            F.col(p["field"]),
            F.lit(p.get("field_split", " ")),
            F.lit(p.get("value_split", "=")),
        ),
    )


def _proc_html_strip(df, p):  # HtmlStripProcessor.java
    return df.withColumn(p["field"], F.regexp_replace(F.col(p["field"]), r"<[^>]*>", ""))


def _proc_urldecode(df, p):  # URLDecodeProcessor.java
    return df.withColumn(p["field"], F.url_decode(F.col(p["field"])))


def _proc_bytes(df, p):      # BytesProcessor.java ("1kb" -> 1024)
    c = F.col(p["field"])
    num = F.regexp_extract(c, r"(?i)^\s*([\d.]+)", 1).cast("double")
    unit = F.lower(F.regexp_extract(c, r"(?i)([kmgtp]?b)\s*$", 1))
    mult = (
        F.when(unit == "b", 1.0)
        .when(unit == "kb", 1024.0)
        .when(unit == "mb", 1024.0**2)
        .when(unit == "gb", 1024.0**3)
        .when(unit == "tb", 1024.0**4)
        .when(unit == "pb", 1024.0**5)
        .otherwise(1.0)
    )
    return df.withColumn(p.get("target_field", p["field"]), (num * mult).cast("long"))


def _proc_sort(df, p):       # SortProcessor.java (array sort)
    asc = p.get("order", "asc") == "asc"
    return df.withColumn(p["field"], F.array_sort(F.col(p["field"])) if asc
                         else F.reverse(F.array_sort(F.col(p["field"]))))


def _proc_dissect(df, p):    # DissectProcessor.java (simplified %{key} patterns)
    import re

    pattern = p["pattern"]
    keys = re.findall(r"%\{(\w+)\}", pattern)
    literals = re.split(r"%\{\w+\}", pattern)
    regex = "^" + "(.*?)".join(re.escape(x) for x in literals) + "$"
    out = df
    for i, k in enumerate(keys):
        out = out.withColumn(k, F.regexp_extract(F.col(p["field"]), regex, i + 1))
    return out


def _proc_grok(df, p):       # GrokProcessor.java (named-group regex subset)
    out = df
    for name, idx in p["groups"].items():
        out = out.withColumn(name, F.regexp_extract(F.col(p["field"]), p["pattern"], idx))
    return out


def _proc_append(df, p):     # AppendProcessor.java
    vals = p["value"] if isinstance(p["value"], list) else [p["value"]]
    return df.withColumn(
        p["field"], F.concat(F.col(p["field"]), F.array(*[F.lit(v) for v in vals]))
    )


def _proc_fail(df, p):       # FailProcessor.java
    raise ValueError(p.get("message", "ingest pipeline failed"))


def _proc_csv(df, p):        # CsvProcessor.java
    """Parse a delimited line into the given target fields (quote-less
    fast path; the reference's quote handling rides the same split)."""
    sep = p.get("separator", ",")
    parts = F.split(F.col(p["field"]), F.lit(sep).cast("string"))
    out = df
    for i, tgt in enumerate(p["target_fields"]):
        out = out.withColumn(tgt, F.trim(parts.getItem(i)) if p.get("trim")
                             else parts.getItem(i))
    return out


def _proc_dot_expander(df, p):  # DotExpanderProcessor.java
    """"a.b" flat column -> struct column a{b} (merging with an existing
    struct ``a`` is out of scope — the flat-column model has no partial
    structs to merge into)."""
    field = p["field"]
    head, tail = field.split(".", 1)
    # backticks: the dotted name is a flat column, not a struct path
    return df.withColumn(
        head, F.struct(F.col(f"`{field}`").alias(tail))
    ).drop(field)


def _proc_foreach(df, p):    # ForeachProcessor.java
    """Apply an inner per-element transform over an array field via
    Catalyst ``transform`` — the supported inner processors are the
    scalar string ones (lowercase/uppercase/trim/gsub), matching the
    reference's common usage; everything stays JVM-side."""
    inner = p["processor"]
    if len(inner) != 1:
        raise ValueError("foreach.processor must have exactly one key")
    name, ip = next(iter(inner.items()))
    fns = {
        "lowercase": lambda x: F.lower(x),
        "uppercase": lambda x: F.upper(x),
        "trim": lambda x: F.trim(x),
        "gsub": lambda x: F.regexp_replace(x, ip.get("pattern", ""),
                                           ip.get("replacement", "")),
    }
    if name not in fns:
        raise ValueError(f"foreach does not support inner processor: {name}")
    return df.withColumn(p["field"], F.transform(F.col(p["field"]), fns[name]))


def _proc_remove_by_pattern(df, p):  # RemoveByPatternProcessor.java
    """Drop columns matching shell-style patterns (prefix*/suffix*)."""
    import fnmatch

    pats = (p["field_pattern"] if isinstance(p["field_pattern"], list)
            else [p["field_pattern"]])
    drop = [c for c in df.columns
            if any(fnmatch.fnmatch(c, pat) for pat in pats)]
    return df.drop(*drop) if drop else df


def _proc_script(df, p):     # ScriptProcessor.java
    """``source`` is either a Spark SQL expression over the document's
    columns (the lang-expression analog per SURVEY §2.9) or a Painless
    expression using the reference's own ``ctx.field`` syntax
    (``IngestDocument`` map access), routed through query/painless.py;
    result lands in ``target_field``."""
    from opensearch_spark.query import painless

    return df.withColumn(
        p["target_field"],
        painless.script_expr(p["source"], p.get("lang"), params=p.get("params")),
    )


def _proc_date_index_name(df, p):  # DateIndexNameProcessor.java
    """Compute the rollover index name ``<prefix-{rounded date}>`` from a
    timestamp field: date_rounding y/M/w/d/h/m/s, like the reference."""
    rounding = p["date_rounding"]
    trunc_unit = {"y": "year", "M": "month", "w": "week", "d": "day",
                  "h": "hour", "m": "minute", "s": "second"}[rounding]
    fmt = p.get("index_name_format", "yyyy-MM-dd")
    ts = F.to_timestamp(F.col(p["field"]))
    rounded = F.date_trunc(trunc_unit, ts)
    return df.withColumn(
        "_index",
        F.concat(F.lit(p.get("index_name_prefix", "")),
                 F.date_format(rounded, fmt)),
    )


def _proc_community_id(df, p):  # CommunityIdProcessor.java
    """Community ID v1 flow hash (the published spec the reference
    implements): seed + ordered 5-tuple -> base64(sha1).  The tuple is
    ordered so (src, dst) and (dst, src) hash identically; everything is
    built from Catalyst byte/concat/sha1 primitives, no UDF."""
    seed = int(p.get("seed", 0))
    src_ip, dst_ip = F.col(p["source_ip"]), F.col(p["destination_ip"])
    src_p = F.col(p["source_port"]).cast("int")
    dst_p = F.col(p["destination_port"]).cast("int")
    proto = F.col(p["iana_number"]).cast("int")

    # Binary pieces via Catalyst: unhex of zero-padded hex strings
    def b1(c):  # 1 byte
        return F.unhex(F.lpad(F.conv(c.cast("string"), 10, 16), 2, "0"))

    def b2(c):  # 2 bytes big-endian
        return F.unhex(F.lpad(F.conv(c.cast("string"), 10, 16), 4, "0"))

    def ipb(ip):
        o = F.split(ip, r"\.")
        return F.concat(*[b1(o.getItem(i).cast("int")) for i in range(4)])

    fwd = (ipb(src_ip) < ipb(dst_ip)) | (
        (ipb(src_ip) == ipb(dst_ip)) & (src_p <= dst_p)
    )
    ip_a = F.when(fwd, ipb(src_ip)).otherwise(ipb(dst_ip))
    ip_b = F.when(fwd, ipb(dst_ip)).otherwise(ipb(src_ip))
    p_a = F.when(fwd, src_p).otherwise(dst_p)
    p_b = F.when(fwd, dst_p).otherwise(src_p)
    payload = F.concat(
        b2(F.lit(seed)), ip_a, ip_b, b1(proto), b1(F.lit(0)), b2(p_a), b2(p_b)
    )
    digest = F.unhex(F.sha1(payload))
    return df.withColumn(
        p.get("target_field", "community_id"),
        F.concat(F.lit("1:"), F.base64(digest)),
    )


def _proc_user_agent(df, p):  # ingest-user-agent UserAgentProcessor.java:57,61
    """Parse a browser User-Agent string into name / major version /
    os / device columns (``<target>_name`` etc.) — a compact,
    deterministic subset of the uap-core regex set the reference loads
    from its bundled ``regexes.yml``; pure Catalyst (regexp + CASE
    chain), one projection, no UDF.  Precedence mirrors uap-core:
    Edge/Opera before Chrome (their UAs embed ``Chrome/``), Safari
    requires ``Version/`` (Chrome UAs embed ``Safari/``)."""
    ua = F.col(p["field"])
    tgt = p.get("target_field", "user_agent")
    name = (
        F.when(ua.rlike(r"(?i)bot|spider|crawler"), F.lit("Bot"))
        .when(ua.rlike(r"Edg(e|A|iOS)?/"), F.lit("Edge"))
        .when(ua.rlike(r"OPR/|Opera"), F.lit("Opera"))
        .when(ua.rlike(r"Chrome/"), F.lit("Chrome"))
        .when(ua.rlike(r"Firefox/"), F.lit("Firefox"))
        .when(ua.rlike(r"Version/.*Safari/"), F.lit("Safari"))
        .when(ua.rlike(r"MSIE |Trident/"), F.lit("IE"))
        .when(ua.rlike(r"curl/"), F.lit("curl"))
        .otherwise(F.lit("Other"))
    )
    ver_pat = (
        F.when(name == "Edge", F.regexp_extract(ua, r"Edg(?:e|A|iOS)?/(\d+)", 1))
        .when(name == "Opera", F.regexp_extract(ua, r"OPR/(\d+)", 1))
        .when(name == "Chrome", F.regexp_extract(ua, r"Chrome/(\d+)", 1))
        .when(name == "Firefox", F.regexp_extract(ua, r"Firefox/(\d+)", 1))
        .when(name == "Safari", F.regexp_extract(ua, r"Version/(\d+)", 1))
        .when(name == "curl", F.regexp_extract(ua, r"curl/(\d+)", 1))
        .otherwise(F.lit(""))
    )
    os_ = (
        F.when(ua.rlike(r"Windows NT"), F.lit("Windows"))
        .when(ua.rlike(r"iPhone|iPad|iOS"), F.lit("iOS"))
        .when(ua.rlike(r"Android"), F.lit("Android"))
        .when(ua.rlike(r"Mac OS X"), F.lit("Mac OS X"))
        .when(ua.rlike(r"Linux"), F.lit("Linux"))
        .otherwise(F.lit("Other"))
    )
    device = (
        F.when(name == "Bot", F.lit("Spider"))
        .when(ua.rlike(r"iPad|Tablet"), F.lit("Tablet"))
        .when(ua.rlike(r"Mobi|iPhone|Android"), F.lit("Mobile"))
        .otherwise(F.lit("Other"))
    )
    return (
        df.withColumn(f"{tgt}_name", name)
        .withColumn(f"{tgt}_major", F.nullif(ver_pat, F.lit("")))
        .withColumn(f"{tgt}_os", os_)
        .withColumn(f"{tgt}_device", device)
    )


def _proc_geoip(df, p):  # ingest-geoip GeoIpProcessor.java:74
    """IP -> properties by longest dotted-prefix match against an
    INLINE database: ``{"database": {"10.1.2": {...}, "10.1": {...},
    "10": {...}}, "field": ..., "target_field": ...}``.

    The reference resolves against bundled MaxMind ``.mmdb`` files; no
    such database ships here (honest stub for the data), but the lookup
    plumbing is real and distributed: one literal map per property
    (broadcast to executors inside the plan) probed at /24, /16 and /8
    via ``coalesce`` — longest prefix wins, NULL when no entry, exactly
    the miss behavior of the reference (no geoip fields added)."""
    ip = F.col(p["field"])
    tgt = p.get("target_field", "geoip")
    db = p["database"]
    props = sorted({k for v in db.values() for k in v})
    if not db or not props:
        raise ValueError("geoip requires a non-empty inline database")
    octs = F.split(ip, r"\.")
    probes = [
        F.concat_ws(".", *[octs.getItem(i) for i in range(n)]) for n in (3, 2, 1)
    ]
    out = df
    for prop in props:
        pairs = []
        for prefix, vals in db.items():
            if prop in vals:
                pairs.extend([F.lit(prefix), F.lit(vals[prop])])
        m = F.create_map(*pairs)
        out = out.withColumn(
            f"{tgt}_{prop}", F.coalesce(*[m[pr] for pr in probes])
        )
    return out


def _proc_attachment(df, p):  # ingest-attachment AttachmentProcessor.java:61,63
    """Decode a base64 attachment field into extracted text + metadata
    columns (``<target>_content``, ``<target>_content_type``,
    ``<target>_content_length``).

    The reference extracts via Apache Tika (PDF/DOC/…); no such parser
    ships here, so extraction covers the text-bearing types honestly:
    UTF-8 plain text passes through, HTML is tag-stripped (the
    html_strip machinery), and anything that does not decode as UTF-8
    is classified ``application/octet-stream`` with NULL content — the
    reference likewise leaves fields absent when Tika extracts nothing.
    All Catalyst: unbase64 + decode + CASE, no UDF."""
    field = p["field"]
    tgt = p.get("target_field", "attachment")
    raw = F.unbase64(F.col(field))
    # decode(..., 'UTF-8') with try semantics: non-UTF-8 yields garbage
    # replacement chars; detect binaries by the presence of NUL instead
    txt = raw.cast("string")
    # cast(binary AS string) wraps the raw bytes WITHOUT validation, so
    # binary detection needs two real checks: a NUL byte (valid UTF-8,
    # but never in extractable text) and actual UTF-8 validity
    # (is_valid_utf8 — Spark 4 — catches NUL-free non-UTF-8 payloads)
    is_text = (
        txt.isNotNull()
        & ~txt.contains("\u0000")
        & F.call_function("is_valid_utf8", txt)
    )
    looks_html = txt.rlike(r"(?is)^\s*<(?:!doctype|html|body|div|p|h\d)[\s>]")
    stripped = F.regexp_replace(
        F.regexp_replace(txt, r"(?is)<(script|style)[^>]*>.*?</\1>", " "),
        r"<[^>]*>", " ",
    )
    content = F.when(is_text & looks_html, F.trim(F.regexp_replace(stripped, r"\s+", " "))) \
        .when(is_text, txt)
    ctype = (
        F.when(is_text & looks_html, F.lit("text/html"))
        .when(is_text, F.lit("text/plain"))
        .otherwise(F.lit("application/octet-stream"))
    )
    return (
        df.withColumn(f"{tgt}_content", content)
        .withColumn(f"{tgt}_content_type", ctype)
        .withColumn(f"{tgt}_content_length", F.length(content).cast("long"))
    )


PROCESSORS = {
    "set": _proc_set,
    "copy": _proc_copy,
    "rename": _proc_rename,
    "remove": _proc_remove,
    "lowercase": _proc_lowercase,
    "uppercase": _proc_uppercase,
    "trim": _proc_trim,
    "gsub": _proc_gsub,
    "split": _proc_split,
    "join": _proc_join,
    "convert": _proc_convert,
    "date": _proc_date,
    "json": _proc_json,
    "kv": _proc_kv,
    "html_strip": _proc_html_strip,
    "urldecode": _proc_urldecode,
    "bytes": _proc_bytes,
    "sort": _proc_sort,
    "dissect": _proc_dissect,
    "grok": _proc_grok,
    "append": _proc_append,
    "fail": _proc_fail,
    "csv": _proc_csv,
    "dot_expander": _proc_dot_expander,
    "foreach": _proc_foreach,
    "remove_by_pattern": _proc_remove_by_pattern,
    "script": _proc_script,
    "date_index_name": _proc_date_index_name,
    "community_id": _proc_community_id,
    "user_agent": _proc_user_agent,
    "geoip": _proc_geoip,
    "attachment": _proc_attachment,
}


def apply_pipeline(df: DataFrame, pipeline: Sequence[Dict]) -> DataFrame:
    """Apply an ingest pipeline spec (list of single-key processor
    dicts) — compiles to one Catalyst projection chain."""
    for step in pipeline:
        if len(step) != 1:
            raise ValueError(f"processor step must have one key: {step}")
        name, params = next(iter(step.items()))
        if name not in PROCESSORS:
            raise ValueError(f"unknown processor: {name}")
        df = PROCESSORS[name](df, params)
    return df
