"""Replay the FIXTURES.md §3 golden corpus: engine top-k must be
rank-identical (ids AND float32 scores) to the committed oracle outputs
in tests/fixtures/golden/ — the YAML-spec-test analog of the
reference's rest-api-spec suite (SURVEY.md §5)."""

from __future__ import annotations

import json
import os

import numpy as np
import pytest

FIX_DIR = os.path.join(os.path.dirname(__file__), "fixtures")
with open(os.path.join(FIX_DIR, "queries.jsonl")) as f:
    CASES = [json.loads(line) for line in f if line.strip()]


@pytest.mark.parametrize("case", CASES, ids=[c["id"] for c in CASES])
def test_golden(engine, case):
    with open(os.path.join(FIX_DIR, "golden", f"{case['id']}.json")) as f:
        gold = json.load(f)
    rows = engine.search(case["query"], size=case["k"]).collect()
    got = [(r["conv_id"], r["turn_idx"]) for r in rows]
    expect = [(g["conv_id"], g["turn_idx"]) for g in gold]
    assert got == expect, case["id"]
    for r, g in zip(rows, gold):
        assert float(np.float32(r["score"])) == pytest.approx(
            g["score_float32"], rel=1e-6
        ), (case["id"], r, g)
