"""Equivalence of the Pallas DP kernel vs the portable jnp scan version.

Runs in Pallas interpret mode on CPU; on real TPU hardware the same kernel is
exercised by bench.py.
"""

import numpy as np
import pytest

from hairsplitter_tpu.constants import encode_seq
from hairsplitter_tpu.ops.align import (
    BandSpec,
    Q_SENTINEL,
    T_SENTINEL,
    banded_align_batch,
    readout,
    traceback_batch,
)
from hairsplitter_tpu.ops.align_pallas import banded_align_batch_pallas
from hairsplitter_tpu.utils.sim import random_genome


def _mk_batch(rng, n=8, spec=BandSpec(chunk=64, band=128), err=0.1):
    qb = np.full((n, spec.chunk), Q_SENTINEL, np.int8)
    tb = np.full((n, spec.t_width), T_SENTINEL, np.int8)
    qlens = np.zeros(n, np.int32)
    tlens = np.zeros(n, np.int32)
    for i in range(n):
        L = int(rng.integers(spec.chunk // 2, spec.chunk + 1))
        t = random_genome(L, rng)
        q = list(t)
        for _ in range(int(err * L)):
            p = int(rng.integers(0, len(q)))
            r = rng.random()
            if r < 0.4:
                q[p] = "ACGT"[rng.integers(0, 4)]
            elif r < 0.7 and len(q) > 4:
                q.pop(p)
            else:
                q.insert(p, "ACGT"[rng.integers(0, 4)])
        qc = encode_seq("".join(q))[: spec.chunk]
        tc = encode_seq(t)
        qb[i, : len(qc)] = qc
        tb[i, : len(tc)] = tc
        qlens[i] = len(qc)
        tlens[i] = len(tc)
    return qb, qlens, tb, tlens


@pytest.mark.parametrize("seed", [0, 1])
def test_pallas_matches_jnp(seed):
    rng = np.random.default_rng(seed)
    spec = BandSpec(chunk=64, band=128)
    qb, qlens, tb, tlens = _mk_batch(rng, 32, spec)
    ref = banded_align_batch(qb, qlens, tb, tlens, spec)
    pal = banded_align_batch_pallas(qb, qlens, tb, tlens, spec, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref["row_at_q"]), np.asarray(pal["row_at_q"]))
    np.testing.assert_array_equal(np.asarray(ref["colmin_val"]), np.asarray(pal["colmin_val"]))
    np.testing.assert_array_equal(np.asarray(ref["colmin_i"]), np.asarray(pal["colmin_i"]))
    np.testing.assert_array_equal(np.asarray(ref["bp"]), np.asarray(pal["bp"]))


def test_pallas_full_readout_traceback():
    rng = np.random.default_rng(2)
    spec = BandSpec(chunk=64, band=128)
    qb, qlens, tb, tlens = _mk_batch(rng, 32, spec)
    modes = np.zeros(32, np.int64)
    pal = banded_align_batch_pallas(qb, qlens, tb, tlens, spec, interpret=True)
    cost, si, sb, clip = readout(
        {k: np.asarray(v) for k, v in pal.items()}, qlens, tlens, modes, spec
    )
    ops = traceback_batch(np.asarray(pal["bp"]), qb, tb, si, sb, spec)
    for i in range(32):
        # ops must replay the full query and target
        o = ops[i]
        assert int((o != 3).sum()) == qlens[i]
        assert int((o != 2).sum()) == tlens[i]
        nm = int((o > 0).sum())
        assert nm == cost[i]
