"""Deterministic synthetic conversation-transcript generator.

Produces the BASELINE.json input table shape
``(conv_id string, turn_idx int32, role string, text string, tool string,
ts timestamp)`` — one row per turn — fully deterministically (seeded
splitmix64 mixing, FIXTURES.md §1): the same (n_convs, seed) always yields
byte-identical data at any parallelism, so tests, benchmarks, and resume
runs agree.

Generation is distributed (``spark.range`` over conv indices +
``mapInPandas``) and vectorized: token choices are drawn with numpy from
hashed (conv, turn, pos) keys — no Python RNG state, no driver-side data.

Content mix: Zipf-ranked vocab of 5000 words, high-frequency English
stopwords, punctuated/camel/unicode/digit tokens, an over-255-char token,
and planted query-target phrases ("error handling", "slow query planner")
in deterministically-known turns.
"""

from __future__ import annotations

from typing import Iterator, List

import numpy as np
import pandas as pd

EPOCH = np.datetime64("2026-01-01T00:00:00")
TURN_STEP_S = 7

VOCAB_SIZE = 5000
STOPWORDS = np.array(
    ["the", "and", "of", "to", "a", "in", "is", "it", "for", "on"], dtype=object
)
SPECIALS = np.array(
    [
        "ErrorHandling",
        "foo.bar",
        "can't",
        "state-of-the-art",
        "snake_case",
        "x86_64",
        "café",
        "naïve",
        "東京",
        "404",
        "3.14",
        "retry-loop",
        "timeout",
        "traceback",
        "x" * 300,  # over-255-char token: split by the analyzer
    ],
    dtype=object,
)
ROLES = np.array(["user", "assistant", "tool"], dtype=object)

_VOCAB = np.array([f"w{i:04d}" for i in range(1, VOCAB_SIZE + 1)], dtype=object)

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain algorithm)."""
    z = x.astype(np.uint64) + _GOLDEN
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _mix(*parts: np.ndarray) -> np.ndarray:
    acc = np.zeros_like(np.asarray(parts[0], dtype=np.uint64))
    for p in parts:
        acc = _splitmix64(acc ^ np.asarray(p, dtype=np.uint64))
    return acc


def conv_len(i: np.ndarray) -> np.ndarray:
    """Turns in conversation i: 1 + (i*2654435761 % 12) == 1 + i%12."""
    i = np.asarray(i, dtype=np.uint64)
    return (1 + (i * np.uint64(2654435761)) % np.uint64(12)).astype(np.int64)


def _conv_turn_offset(i: np.ndarray) -> np.ndarray:
    """Global turn ordinal of (conv i, turn 0), in closed form: lengths
    cycle with period 12 (2654435761 ≡ 1 mod 12)."""
    i = np.asarray(i, dtype=np.int64)
    r = i % 12
    return i + 66 * (i // 12) + r * (r - 1) // 2


def n_turns(n_convs: int) -> int:
    return int(_conv_turn_offset(np.asarray([n_convs]))[0])


def _gen_tokens(keys: np.ndarray, seed: int) -> np.ndarray:
    """One token per key (vectorized)."""
    h = _mix(keys, np.full(keys.shape, seed, dtype=np.uint64))
    sel = h % np.uint64(1000)
    h2 = _splitmix64(h)
    out = np.empty(keys.shape, dtype=object)

    stop_m = sel < 300  # 30% high-frequency stopwords (hot-term skew driver)
    spec_m = (sel >= 300) & (sel < 320)  # 2% special tokens
    zipf_m = ~(stop_m | spec_m)

    out[stop_m] = STOPWORDS[(h2[stop_m] % np.uint64(len(STOPWORDS))).astype(np.int64)]
    out[spec_m] = SPECIALS[(h2[spec_m] % np.uint64(len(SPECIALS))).astype(np.int64)]
    # Zipf-ish: log-uniform rank over the vocab
    u = (h2[zipf_m] >> np.uint64(11)).astype(np.float64) / float(1 << 53)
    rank = np.minimum(
        (np.exp(u * np.log(VOCAB_SIZE)) - 1).astype(np.int64), VOCAB_SIZE - 1
    )
    out[zipf_m] = _VOCAB[rank]
    return out


def generate_pandas(conv_ids: np.ndarray, seed: int = 42) -> pd.DataFrame:
    """Generate all turns for the given conversation indices."""
    conv_ids = np.asarray(conv_ids, dtype=np.int64)
    lens = conv_len(conv_ids)
    n = int(lens.sum())
    conv_rep = np.repeat(conv_ids, lens)
    turn_idx = np.arange(n, dtype=np.int64) - np.repeat(
        np.cumsum(lens) - lens, lens
    )

    key = _mix(conv_rep.astype(np.uint64), turn_idx.astype(np.uint64))
    role_off = _mix(conv_rep.astype(np.uint64)) % np.uint64(3)
    role = ROLES[((role_off + turn_idx.astype(np.uint64)) % np.uint64(3)).astype(np.int64)]

    n_tok = (5 + (key % np.uint64(56))).astype(np.int64)
    tok_starts = np.concatenate(([0], np.cumsum(n_tok)[:-1]))
    total = int(n_tok.sum())
    tok_turn = np.repeat(np.arange(n), n_tok)
    tok_pos = np.arange(total, dtype=np.int64) - np.repeat(tok_starts, n_tok)
    tok_keys = _mix(key[tok_turn], tok_pos.astype(np.uint64))
    tokens = _gen_tokens(tok_keys, seed)

    # planted phrases at deterministically-known turns
    plant_eh = (key % np.uint64(97)) == 0
    plant_sq = (key % np.uint64(211)) == 0

    texts: List[str] = []
    for t in range(n):
        toks = tokens[tok_starts[t] : tok_starts[t] + n_tok[t]]
        parts = list(toks)
        if plant_eh[t]:
            parts[:0] = ["error", "handling"]
        if plant_sq[t]:
            parts.extend(["slow", "query", "planner"])
        texts.append(" ".join(parts))

    global_ord = _conv_turn_offset(conv_rep) + turn_idx
    ts = EPOCH + (global_ord * TURN_STEP_S).astype("timedelta64[s]")
    tool = np.empty(n, dtype=object)
    toolm = role == "tool"
    tool[toolm] = [
        f"tool-{k}" for k in (key[toolm] % np.uint64(5)).astype(np.int64)
    ]
    tool[~toolm] = None
    return pd.DataFrame(
        {
            "conv_id": [f"conv-{i:08d}" for i in conv_rep],
            "turn_idx": turn_idx.astype(np.int32),
            "role": role,
            "text": texts,
            "tool": tool,
            "ts": pd.Series(ts),
        }
    )


def generate(spark, n_convs: int, seed: int = 42, partitions: int = 32):
    """Distributed transcript DataFrame for conv indices [0, n_convs)."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("turn_idx", T.IntegerType(), False),
            T.StructField("role", T.StringType(), False),
            T.StructField("text", T.StringType(), False),
            T.StructField("tool", T.StringType(), True),
            T.StructField("ts", T.TimestampType(), False),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield generate_pandas(pdf["id"].to_numpy(), seed)

    return (
        spark.range(0, n_convs, numPartitions=partitions)
        .mapInPandas(gen, schema=schema)
    )
