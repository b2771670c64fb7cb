"""Varint / d-gap / positions codec round-trips (FIXTURES.md §5)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from opensearch_spark.index import codec


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=200))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert (codec.varint_decode(codec.varint_encode(arr)) == arr).all()


def test_varint_boundaries():
    # exact powers of 2^7k — the byte-length boundaries
    vals = np.array(
        [0, 1, 127, 128, 2**14 - 1, 2**14, 2**28 - 1, 2**28, 2**35, 2**62],
        dtype=np.uint64,
    )
    out = codec.varint_decode(codec.varint_encode(vals))
    assert (out == vals).all()


def test_byte_lengths_match_encoding():
    rng = np.random.default_rng(42)
    vals = rng.integers(0, 2**50, 5000).astype(np.uint64)
    enc = codec.varint_encode(vals)
    assert len(enc) == int(codec.varint_byte_lengths(vals).sum())


@given(
    st.lists(
        st.integers(min_value=0, max_value=2**40), min_size=1, max_size=300, unique=True
    )
)
@settings(max_examples=100, deadline=None)
def test_docdelta_roundtrip(ids):
    docs = np.array(sorted(ids), dtype=np.int64)
    base = int(docs[0])
    buf = codec.pack_doc_deltas(docs, base)
    assert (codec.unpack_doc_deltas(buf, base) == docs).all()


def test_positions_roundtrip():
    rng = np.random.default_rng(7)
    for _ in range(20):
        tfs = rng.integers(1, 8, rng.integers(1, 40))
        pos = np.concatenate(
            [np.sort(rng.choice(500, k, replace=False)) for k in tfs]
        )
        buf = codec.pack_positions(pos, tfs)
        assert (codec.unpack_positions(buf, tfs) == pos).all()


def test_large_deltas_over_2pow28():
    # FIXTURES.md §5: deltas >= 2^28 (10^12-doc address space)
    docs = np.array([0, 2**28, 2**29, 2**40, 2**40 + 1], dtype=np.int64)
    buf = codec.pack_doc_deltas(docs, 0)
    assert (codec.unpack_doc_deltas(buf, 0) == docs).all()


def test_empty():
    assert codec.varint_encode(np.array([], dtype=np.uint64)) == b""
    assert codec.varint_decode(b"").size == 0
    assert codec.pack_positions(np.array([]), np.array([])) == b""


# ---------------------------------------------------------- FOR codec

import numpy as np
import pytest as _pytest

from opensearch_spark.index import codec as _c


@_pytest.mark.parametrize("seed", [1, 2, 3])
def test_for_block_roundtrip(seed):
    rng = np.random.RandomState(seed)
    for n in (0, 1, 7, 128, 300):
        for hi in (1, 2, 255, 1 << 20, 1 << 45):
            v = rng.randint(0, hi, size=n).astype(np.uint64)
            out = _c.for_decode_block(_c.for_encode_block(v), n)
            assert np.array_equal(out, v), (n, hi)


def test_for_zero_width():
    v = np.zeros(128, dtype=np.uint64)
    buf = _c.for_encode_block(v)
    assert buf == b"\x00"
    assert np.array_equal(_c.for_decode_block(buf, 128), v)


@_pytest.mark.parametrize("name", ["varint", "for"])
def test_codec_encode_blocks_roundtrip(name):
    rng = np.random.RandomState(9)
    vals = rng.randint(0, 1000, size=1000).astype(np.uint64)
    starts, ends = _c.block_bounds(1000, 128)
    bc = _c.get_codec(name)
    blocks = bc.encode_blocks(vals, starts, ends)
    out = np.concatenate(
        [bc.decode(b, e - s) for b, s, e in zip(blocks, starts, ends)]
    ).astype(np.uint64)
    assert np.array_equal(out, vals)


def test_for_denser_on_small_gaps():
    """FOR beats varint on dense (hot-term) gap runs — the reason the
    reference uses FOR blocks for postings."""
    gaps = np.ones(128, dtype=np.uint64)  # stopword-like: every doc
    for_size = len(_c.for_encode_block(gaps))
    varint_size = len(_c.varint_encode(gaps))
    assert for_size < varint_size
