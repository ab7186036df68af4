"""Bit-exactness of the Myers bit-vector DP vs the int32 banded kernel."""

import numpy as np
import pytest

from hairsplitter_tpu.ops.align import (
    BandSpec,
    Q_SENTINEL,
    T_SENTINEL,
    banded_align_batch,
    readout,
    traceback_batch,
)
from hairsplitter_tpu.ops.align_myers import myers_rows_numpy, myers_to_align_result


def _random_batch(rng, n, spec, mutate=0.15):
    B, T = spec.chunk, spec.t_width
    q = np.full((n, B), Q_SENTINEL, dtype=np.int8)
    t = np.full((n, T), T_SENTINEL, dtype=np.int8)
    qlens = np.zeros(n, dtype=np.int32)
    tlens = np.zeros(n, dtype=np.int32)
    for i in range(n):
        kind = rng.integers(0, 6)
        ql = int(rng.integers(0, B + 1))
        if kind == 0:  # empty query
            ql = 0
        base = rng.integers(0, 4, size=max(ql, 1)).astype(np.int8)
        if kind == 1:  # identical
            tl = ql
            tseq = base[:ql].copy()
        elif kind == 2:  # unrelated
            tl = int(rng.integers(0, T + 1))
            tseq = rng.integers(0, 4, size=tl).astype(np.int8)
        else:  # mutated copy with indels
            tseq = []
            for c in base[:ql]:
                r = rng.random()
                if r < mutate / 3:
                    continue  # deletion
                if r < 2 * mutate / 3:
                    tseq.append(int(rng.integers(0, 4)))  # substitution
                else:
                    tseq.append(int(c))
                if rng.random() < mutate / 3:
                    tseq.append(int(rng.integers(0, 4)))  # insertion
            tseq = np.asarray(tseq[:T], dtype=np.int8)
            tl = len(tseq)
        q[i, :ql] = base[:ql]
        t[i, :tl] = tseq[:tl]
        qlens[i] = ql
        tlens[i] = tl
    return q, qlens, t, tlens


@pytest.mark.parametrize(
    "spec,n,seed",
    [
        (BandSpec(chunk=48, band=32), 64, 0),
        (BandSpec(chunk=64, band=64), 48, 1),
        (BandSpec(chunk=256, band=128), 24, 2),
    ],
)
def test_myers_numpy_bit_identical(spec, n, seed):
    rng = np.random.default_rng(seed)
    q, qlens, t, tlens = _random_batch(rng, n, spec)
    ref = {k: np.asarray(v) for k, v in banded_align_batch(q, qlens, t, tlens, spec).items()}
    P, M = myers_rows_numpy(q, t, spec)
    got = myers_to_align_result(P, M, q, t, qlens, tlens, spec)
    np.testing.assert_array_equal(got["row_at_q"], ref["row_at_q"])
    np.testing.assert_array_equal(got["colmin_val"], ref["colmin_val"])
    np.testing.assert_array_equal(got["colmin_i"], ref["colmin_i"])
    np.testing.assert_array_equal(got["bp"], ref["bp"])


def test_myers_traceback_identical():
    spec = BandSpec(chunk=64, band=64)
    rng = np.random.default_rng(7)
    q, qlens, t, tlens = _random_batch(rng, 32, spec)
    modes = (np.arange(32) % 2).astype(np.int32)
    ref = {k: np.asarray(v) for k, v in banded_align_batch(q, qlens, t, tlens, spec).items()}
    P, M = myers_rows_numpy(q, t, spec)
    got = myers_to_align_result(P, M, q, t, qlens, tlens, spec)
    cost_r, si_r, sb_r, clip_r = readout(ref, qlens, tlens, modes, spec)
    cost_g, si_g, sb_g, clip_g = readout(got, qlens, tlens, modes, spec)
    np.testing.assert_array_equal(cost_g, cost_r)
    np.testing.assert_array_equal(clip_g, clip_r)
    ops_r = traceback_batch(ref["bp"], q, t, si_r, sb_r, spec)
    ops_g = traceback_batch(got["bp"], q, t, si_g, sb_g, spec)
    for a, b in zip(ops_g, ops_r):
        np.testing.assert_array_equal(a, b)


def test_myers_pallas_interpret_matches_numpy():
    from hairsplitter_tpu.ops.align_myers_pallas import (
        banded_align_batch_myers,
        myers_rows_pallas,
        words_from_device,
    )

    spec = BandSpec(chunk=64, band=128)
    rng = np.random.default_rng(3)
    q, qlens, t, tlens = _random_batch(rng, 32, spec)
    P_np, M_np = myers_rows_numpy(q, t, spec)
    p_dev, m_dev = myers_rows_pallas(q, t, spec, interpret=True)
    np.testing.assert_array_equal(words_from_device(np.asarray(p_dev), spec.chunk), P_np)
    np.testing.assert_array_equal(words_from_device(np.asarray(m_dev), spec.chunk), M_np)

    ref = {k: np.asarray(v) for k, v in banded_align_batch(q, qlens, t, tlens, spec).items()}
    got = banded_align_batch_myers(q, qlens, t, tlens, spec, interpret=True)
    for k in ("bp", "row_at_q", "colmin_val", "colmin_i"):
        np.testing.assert_array_equal(got[k], ref[k])


def test_device_traceback_matches_host():
    from hairsplitter_tpu.ops.align_device import align_traceback_device

    spec = BandSpec(chunk=64, band=64)
    rng = np.random.default_rng(11)
    q, qlens, t, tlens = _random_batch(rng, 48, spec)
    modes = (np.arange(48) % 2).astype(np.int32)
    ref = {k: np.asarray(v) for k, v in banded_align_batch(q, qlens, t, tlens, spec).items()}
    cost_r, si_r, sb_r, clip_r = readout(ref, qlens, tlens, modes, spec)
    ops_r = traceback_batch(ref["bp"], q, t, si_r, sb_r, spec)

    from hairsplitter_tpu.ops.align_device import split_fused

    fused = align_traceback_device(q, qlens, t, tlens, modes, spec, use_pallas=False)
    ops_rev, meta = split_fused(fused)
    np.testing.assert_array_equal(meta[:, 1], cost_r)
    np.testing.assert_array_equal(meta[:, 2], clip_r)
    for i in range(48):
        got = ops_rev[i, : meta[i, 0]][::-1]
        np.testing.assert_array_equal(got, ops_r[i])
