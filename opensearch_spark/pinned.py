"""Bounded registry for persisted DataFrames.

Operators that persist an intermediate frame used twice inside a lazily
returned plan (WAND rare partials, ppjoin shingle base) cannot know
when the caller's terminal action runs, so a bare ``.persist()`` would
pin executor storage for the life of the session — one leak per query
(the reference's analog is Lucene's bounded query/filter caches,
``LRUQueryCache``).  ``PinnedLRU`` keeps the N most recent handles and
unpersists the oldest on overflow: recent plans stay cached, older ones
fall back to recompute (correctness is unaffected — unpersist only
drops the materialized blocks, the lineage still computes).
"""

from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame


class PinnedLRU:
    def __init__(self, cap: int = 4):
        self.cap = int(cap)
        self._items: List[DataFrame] = []

    def pin(self, df: DataFrame) -> DataFrame:
        """Register a persisted frame; evict (unpersist) the oldest
        beyond the cap.  Returns ``df`` for chaining."""
        self._items.append(df)
        while len(self._items) > self.cap:
            old = self._items.pop(0)
            try:
                old.unpersist(blocking=False)
            except Exception:
                pass
        return df

    def release(self) -> None:
        """Unpersist everything tracked (explicit session cleanup)."""
        for df in self._items:
            try:
                df.unpersist(blocking=False)
            except Exception:
                pass
        self._items.clear()


# shared default registry for engine-less operators (ops.dedup etc.)
DEFAULT = PinnedLRU(cap=4)
