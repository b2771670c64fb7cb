"""Query insights: the query-insights plugin's top-N queries service.

Reference: ``plugins/query-insights/.../core/service/TopQueriesService.java``
(fixed-window record store, top-N by a MetricType) +
``rules/model/SearchQueryRecord.java`` (one record per search: timestamp,
latency, the query shape) + ``rules/model/MetricType.java``
(LATENCY / CPU / MEMORY — here latency and hit count; there is no
per-query CPU meter in a Spark driver).

Records live in a bounded deque on the driver — like the reference,
this is an operational telemetry buffer, not an index.
"""

from __future__ import annotations

import time
from collections import deque
from typing import Deque, Dict, List, Optional


class QueryInsights:
    """Bounded record store + top-N view of the slowest queries.

    ``measure`` wraps ``SearchEngine.profile`` (the per-phase timing
    breakdown) and records the result; ``record`` accepts timings
    captured elsewhere.  ``top_queries`` is the
    ``GET /_insights/top_queries`` analog.
    """

    def __init__(self, capacity: int = 1000):
        self.capacity = int(capacity)
        self._records: Deque[Dict] = deque(maxlen=self.capacity)

    def record(
        self,
        query_shape: str,
        took_ms: float,
        hits: int = 0,
        timestamp: Optional[float] = None,
        breakdown_ms: Optional[Dict[str, float]] = None,
    ) -> None:
        self._records.append(
            {
                "timestamp": time.time() if timestamp is None else timestamp,
                "query": query_shape,
                "took_ms": float(took_ms),
                "hits": int(hits),
                "breakdown_ms": breakdown_ms or {},
            }
        )

    def measure(self, engine, query, size: int = 10) -> Dict:
        """Run ``engine.profile`` (executes the search) and record it;
        returns the profile dict."""
        prof = engine.profile(query, size=size)
        self.record(
            prof["query"], prof["took_ms"], prof["hits"],
            breakdown_ms=prof["breakdown_ms"],
        )
        return prof

    def top_queries(self, n: int = 10, metric: str = "latency") -> List[Dict]:
        """Top-N records, most expensive first (TopQueriesService
        getTopQueriesRecords).  ``metric``: ``latency`` (took_ms) or
        ``hits``."""
        keys = {"latency": "took_ms", "hits": "hits"}
        if metric not in keys:
            raise ValueError(f"unknown metric {metric!r} (latency|hits)")
        k = keys[metric]
        return sorted(self._records, key=lambda r: (-r[k], r["timestamp"]))[:n]

    def clear(self) -> None:
        self._records.clear()

    def __len__(self) -> int:
        return len(self._records)
