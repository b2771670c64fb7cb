"""Index aliases: named (optionally filtered) views over indexes.

The reference models aliases as cluster-state metadata
(``cluster/metadata/AliasMetadata.java``; mutation API
``action/admin/indices/alias/IndicesAliasesRequest.java``): an alias
names one or more concrete indexes, each pairing optionally carrying a
FILTER query that is AND-ed into every search through the alias, plus
an optional ``is_write_index`` flag marking the one index writes route
to.

Spark mapping: a tiny JSON-persisted registry (the cluster-state
analog); searching through an alias fans out across its targets (the
multi-index scatter of SURVEY §3.1) with each target scored by its own
corpus statistics, the alias filter wrapped in as a ``bool.filter``
clause — reusing the engine's compound machinery end-to-end.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from opensearch_spark.index.reader import InvertedIndex
from opensearch_spark.query.executor import SearchEngine


class AliasRegistry:
    """Alias metadata + alias-aware search."""

    def __init__(self, spark: SparkSession, path: Optional[str] = None):
        self.spark = spark
        self.path = path
        self._aliases: Dict[str, List[Dict]] = {}
        if path and os.path.exists(path):
            with open(path) as f:
                self._aliases = json.load(f)

    def _save(self) -> None:
        if self.path:
            tmp = self.path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(self._aliases, f, indent=1)
            os.replace(tmp, self.path)

    # ---- mutation API (IndicesAliasesRequest actions) ----

    def add(
        self,
        alias: str,
        index_dir: str,
        filter: Optional[dict] = None,
        is_write_index: bool = False,
    ) -> None:
        entries = self._aliases.setdefault(alias, [])
        entries[:] = [e for e in entries if e["index"] != index_dir]
        if is_write_index:
            for e in entries:
                e["is_write_index"] = False
        entries.append(
            {"index": index_dir, "filter": filter,
             "is_write_index": is_write_index}
        )
        self._save()

    def remove(self, alias: str, index_dir: str) -> None:
        entries = self._aliases.get(alias, [])
        entries[:] = [e for e in entries if e["index"] != index_dir]
        if not entries:
            self._aliases.pop(alias, None)
        self._save()

    def resolve(self, alias: str) -> List[Dict]:
        if alias not in self._aliases:
            raise KeyError(f"no such alias: {alias}")
        return list(self._aliases[alias])

    def write_index(self, alias: str) -> str:
        """The single write target (IndicesAliasesRequest's
        is_write_index contract: exactly one, or a lone unfiltered
        target)."""
        entries = self.resolve(alias)
        marked = [e for e in entries if e.get("is_write_index")]
        if len(marked) == 1:
            return marked[0]["index"]
        if len(entries) == 1:
            return entries[0]["index"]
        raise ValueError(
            f"alias {alias} has {len(entries)} targets and no write index"
        )

    # ---- search through the alias ----

    def search(
        self, alias: str, query: dict, size: int = 10,
        round_scores: Optional[int] = None,
    ) -> DataFrame:
        """Fan-out search over the alias targets; each target's filter
        (if any) is AND-ed in as a bool filter clause (scoreless, like
        the reference's alias filters), each target scores with its own
        statistics, global top-k with (score desc, id asc) tie-break."""
        parts = []
        id_cols: Optional[List[str]] = None
        for e in self.resolve(alias):
            eng = SearchEngine(InvertedIndex(self.spark, e["index"]))
            q = query
            if e.get("filter"):
                q = {"bool": {"must": [query], "filter": [e["filter"]]}}
            scored = eng._score_with_deletes_applied(q)
            dm = eng.index.docmap().select("_docid", *eng.id_cols)
            parts.append(
                scored.join(dm, "_docid").select(*eng.id_cols, "score")
            )
            id_cols = id_cols or eng.id_cols
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        if round_scores is not None:
            u = u.withColumn("score", F.round(F.col("score"), round_scores))
        return u.orderBy(
            F.desc("score"), *[F.asc(c) for c in id_cols]
        ).limit(size)
