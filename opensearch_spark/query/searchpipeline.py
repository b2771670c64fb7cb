"""Search pipelines: request/response processor chains around a search.

The reference's search pipelines (``search/pipeline/Pipeline.java``,
``SearchPipelineService``; the common processors in
``modules/search-pipeline-common/.../SearchPipelineCommonModulePlugin.java``)
transform the request before the query phase and the hits after the
fetch phase.  Implemented processors (one class each in the reference):

Request processors:

- ``filter_query``   FilterQueryRequestProcessor.java — AND an extra
                     filter query into the request (scoreless, wrapped
                     as ``bool.filter`` exactly like the reference's
                     BoolQueryBuilder composition).
- ``oversample``     OversampleRequestProcessor.java — multiply the
                     requested size by ``sample_factor`` and remember
                     the original in the processing context (the
                     rerank-then-truncate pattern).
- ``script``         ScriptRequestProcessor.java — mutate the request
                     itself before the query phase.  The reference runs
                     Painless over the SearchRequest; here the script is
                     a restricted arithmetic expression assigned to the
                     ``size`` request attribute, e.g.
                     ``{"script": {"source": "size = size * 2 + 1"}}``
                     — evaluated driver-side with a safe AST walker (no
                     eval, names limited to request attributes; the
                     result clamps at 0).  ``from`` is not assignable:
                     it is a Python keyword, so the expression grammar
                     cannot express it — the validator names the
                     assignable attributes in its error.

Response processors:

- ``rename_field``   RenameFieldResponseProcessor.java
- ``truncate_hits``  TruncateHitsResponseProcessor.java — cut back to
                     ``target_size`` (default: the pre-oversample size
                     from the context, mirroring the reference pairing).
- ``collapse``       CollapseResponseProcessor.java — keep the best hit
                     per distinct field value (score desc, id asc).

Spark mapping: request processors rewrite the query dict; response
processors are DataFrame transforms on the (already tiny) top-k frame,
so the whole pipeline stays one engine search plus driver-side plan
decoration.
"""

from __future__ import annotations

import ast
import operator
from typing import Dict, List, Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SCRIPT_OPS = {
    ast.Add: operator.add, ast.Sub: operator.sub,
    ast.Mult: operator.mul, ast.FloorDiv: operator.floordiv,
    ast.Div: operator.truediv, ast.Mod: operator.mod,
}


def _eval_request_script(source: str, env: Dict[str, int]) -> Dict[str, int]:
    """Evaluate ``attr = <arithmetic over request attrs>`` safely
    (ScriptRequestProcessor.java analog — the sandboxed subset: names
    limited to request attributes, operators to arithmetic)."""
    try:
        tree = ast.parse(source.strip(), mode="exec")
    except SyntaxError as e:
        # keep the ValueError contract (e.g. 'from = ...' — a Python
        # keyword — cannot even parse)
        raise ValueError(
            f"unparsable request script {source!r} "
            f"(assignable attributes: {sorted(env)}): {e}"
        ) from None
    if len(tree.body) != 1 or not isinstance(tree.body[0], ast.Assign):
        raise ValueError("request script must be a single assignment")
    (target,) = tree.body[0].targets
    if not isinstance(target, ast.Name) or target.id not in env:
        raise ValueError(f"request script may only assign {sorted(env)}")

    def ev(node):
        if isinstance(node, ast.Constant) and isinstance(node.value, (int, float)):
            return node.value
        if isinstance(node, ast.Name):
            if node.id not in env:
                raise ValueError(f"unknown name {node.id!r} in request script")
            return env[node.id]
        if isinstance(node, ast.BinOp) and type(node.op) in _SCRIPT_OPS:
            try:
                return _SCRIPT_OPS[type(node.op)](ev(node.left), ev(node.right))
            except ZeroDivisionError:
                raise ValueError("division by zero in request script") from None
        raise ValueError(f"unsupported request-script syntax: {ast.dump(node)}")

    return {**env, target.id: int(ev(tree.body[0].value))}


class SearchPipeline:
    """A compiled pipeline: ``run(engine, query, size)`` applies
    request processors -> engine.search -> response processors."""

    _KNOWN_REQUEST = frozenset({"filter_query", "oversample", "script"})
    _KNOWN_RESPONSE = frozenset({"rename_field", "truncate_hits", "collapse"})

    def __init__(
        self,
        request_processors: Sequence[Dict] = (),
        response_processors: Sequence[Dict] = (),
    ):
        self.request_processors = list(request_processors)
        self.response_processors = list(response_processors)
        for p in self.request_processors + self.response_processors:
            if len(p) != 1:
                raise ValueError(f"processor step must have one key: {p}")
        for p in self.request_processors:
            (name,) = p
            if name not in self._KNOWN_REQUEST:
                raise ValueError(f"unknown request processor: {name}")
        for p in self.response_processors:
            (name,) = p
            if name not in self._KNOWN_RESPONSE:
                raise ValueError(f"unknown response processor: {name}")

    @classmethod
    def from_spec(cls, spec: Dict) -> "SearchPipeline":
        """Parse the reference's JSON pipeline shape
        ``{"request_processors": [...], "response_processors": [...]}``."""
        return cls(
            spec.get("request_processors", []),
            spec.get("response_processors", []),
        )

    def run(
        self,
        engine,
        query: Dict,
        size: int = 10,
        source_cols: Optional[Sequence[str]] = None,
    ) -> DataFrame:
        ctx: Dict = {"original_size": size}
        q, eff_size = dict(query), size
        for p in self.request_processors:
            (name,), (params,) = zip(*p.items())
            if name == "filter_query":
                q = {"bool": {"must": [q], "filter": [params["query"]]}}
            elif name == "oversample":
                factor = float(params["sample_factor"])
                ctx["original_size"] = eff_size
                eff_size = int(eff_size * factor)
            elif name == "script":
                env = _eval_request_script(params["source"], {"size": eff_size})
                eff_size = max(0, env["size"])
        df = engine.search(q, size=eff_size, source_cols=source_cols)
        id_cols = list(engine.id_cols)
        for p in self.response_processors:
            (name,), (params,) = zip(*p.items())
            if name == "rename_field":
                df = df.withColumnRenamed(
                    params["field"], params["target_field"]
                )
            elif name == "truncate_hits":
                n = int(params.get("target_size", ctx["original_size"]))
                df = df.limit(n)
            elif name == "collapse":
                fld = params["field"]
                w = Window.partitionBy(fld).orderBy(
                    F.desc("score"), *[F.asc(c) for c in id_cols]
                )
                df = (
                    df.withColumn("_sp_rn", F.row_number().over(w))
                    .filter(F.col("_sp_rn") == 1)
                    .drop("_sp_rn")
                    .orderBy(F.desc("score"), *[F.asc(c) for c in id_cols])
                )
        return df
