"""Native C++ host-runtime library vs the Python reference implementations."""

import numpy as np
import pytest

from hairsplitter_tpu import native
from hairsplitter_tpu.core.seeding import _lis_monotonic
from hairsplitter_tpu.ops.cluster import cw_numpy
from hairsplitter_tpu.pipeline.separate_reads import create_read_graph


needs_native = pytest.mark.skipif(native.get_lib() is None, reason="native lib unavailable")


@needs_native
def test_native_lis(rng):
    for _ in range(20):
        n = int(rng.integers(1, 60))
        t = np.sort(rng.integers(0, 1000, n)).astype(np.int64)
        q = rng.integers(0, 1000, n).astype(np.int64)
        ref = _lis_monotonic(q, t)
        nat = native.lis_monotonic(q)
        # same length is the LIS invariant; indices may differ on ties
        assert nat.size == ref.size
        assert (np.diff(q[nat]) > 0).all() or nat.size <= 1


@needs_native
def test_native_read_graph_matches_python(rng):
    n = 40
    A = (rng.random((n, 12)) < 0.3).astype(np.float32)
    R = ((rng.random((n, 12)) < 0.6) & (A == 0)).astype(np.float32)
    sim = (3 * A @ A.T + R @ R.T).astype(np.int32)
    diff = (A @ R.T + R @ A.T).astype(np.int32)
    np.fill_diagonal(sim, 0)
    np.fill_diagonal(diff, 0)
    mask = rng.random(n) < 0.9
    ref = create_read_graph(mask, sim, diff, 0.05)
    nat = native.create_read_graph(sim, diff, mask, 0.05)
    np.testing.assert_array_equal(ref, nat)


@needs_native
def test_native_cw_two_clusters():
    n1 = n2 = 8
    n = n1 + n2
    adj = np.zeros((n, n), np.int8)
    adj[:n1, :n1] = 1
    adj[n1:, n1:] = 1
    np.fill_diagonal(adj, 0)
    adj[0, n1] = adj[n1, 0] = 1
    labels = native.chinese_whispers(adj, np.arange(n), np.ones(n, bool))
    assert len(set(labels[:n1].tolist())) == 1
    assert len(set(labels[n1:].tolist())) == 1
    assert labels[0] != labels[n1]
    # masked nodes stay -2
    mask = np.ones(n, bool)
    mask[3] = False
    labels = native.chinese_whispers(adj, np.arange(n), mask)
    assert labels[3] == -2
