"""segment_gather_reduce == plain ufunc.reduceat(vals[pos], starts),
including chunk boundaries (segments spanning chunks, whole chunks
inside one segment, final partial chunk)."""

import numpy as np
import pytest

from graftpark import blocks
from graftpark.blocks import segment_gather_reduce


def _reference(vals, pos, starts, op):
    ufunc = np.add if op == "sum" else np.minimum
    return ufunc.reduceat(vals[pos], np.asarray(starts)) if len(pos) else vals[:0]


def _random_csr(rng, n_edges, n_seg, n_state):
    cuts = np.sort(rng.choice(np.arange(1, n_edges), size=n_seg - 1, replace=False))
    starts = np.concatenate([[0], cuts]).astype(np.int32)
    pos = rng.integers(0, n_state, size=n_edges).astype(np.int32)
    return pos, starts


@pytest.mark.parametrize("op,dtype", [("sum", np.float32), ("sum", np.float64), ("min", np.int64)])
def test_matches_reference_across_chunk_boundaries(monkeypatch, op, dtype):
    rng = np.random.default_rng(7)
    monkeypatch.setattr(blocks, "_GATHER_CHUNK", 1000)  # force many chunks
    n_state = 500
    vals = (
        rng.random(n_state).astype(dtype)
        if op == "sum"
        else rng.integers(-(2**40), 2**40, size=n_state).astype(dtype)
    )
    for n_edges, n_seg in [(10_000, 300), (10_000, 3), (999, 10), (1000, 10), (1001, 10)]:
        pos, starts = _random_csr(rng, n_edges, n_seg, n_state)
        got = segment_gather_reduce(vals, pos, starts, op)
        want = _reference(vals, pos, starts, op)
        assert got.dtype == want.dtype
        if op == "min":
            assert np.array_equal(got, want)
        else:
            # dtype-dependent tolerance: the only permitted deviation is
            # chunk-boundary regrouping of additions, which is ~eps-scale
            # per dtype — a loose shared rtol would let a dropped or
            # double-counted boundary element slip through for float64
            np.testing.assert_allclose(got, want, rtol=1e-5 if dtype == np.float32 else 1e-12)


def test_single_segment_spanning_every_chunk(monkeypatch):
    monkeypatch.setattr(blocks, "_GATHER_CHUNK", 64)
    rng = np.random.default_rng(3)
    vals = rng.random(100).astype(np.float64)
    pos = rng.integers(0, 100, size=1000).astype(np.int32)
    starts = np.asarray([0], dtype=np.int32)
    got = segment_gather_reduce(vals, pos, starts, "sum")
    np.testing.assert_allclose(got, [vals[pos].sum()], rtol=1e-9)


def test_empty_and_small_inputs():
    vals = np.asarray([1.0, 2.0])
    assert len(segment_gather_reduce(vals, np.empty(0, np.int32), np.empty(0, np.int32), "sum")) == 0
    got = segment_gather_reduce(vals, np.asarray([1, 0, 1], np.int32), np.asarray([0, 2], np.int32), "sum")
    np.testing.assert_allclose(got, [3.0, 2.0])
