"""Streaming surface: incremental index build (the near-real-time
refresh analog) and the percolator (reverse search)."""
