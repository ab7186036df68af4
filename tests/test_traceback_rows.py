"""Bit-exactness of the row-lockstep device traceback (round 3).

The production mapping path is `ops.align_device.align_traceback_rows`
(DP kernel + readout + row-lockstep traceback in one device call) decoded by
`expand_rows_host` (native C++ or numpy). Everything here is proven equal to
the host pair `ops.align.readout` + `ops.align.traceback_batch` element for
element, across kernels and decoders.
"""

import numpy as np
import pytest

from hairsplitter_tpu.ops.align import (
    BandSpec,
    banded_align_batch,
    readout,
    traceback_batch,
)
from hairsplitter_tpu.ops.align_device import align_traceback_rows, expand_rows_host
from tests.test_align_myers import _random_batch


def _reference(q, qlens, t, tlens, modes, spec):
    ref = {k: np.asarray(v) for k, v in banded_align_batch(q, qlens, t, tlens, spec).items()}
    cost, si, sb, clip = readout(ref, qlens, tlens, modes, spec)
    ops = traceback_batch(ref["bp"], q, t, si, sb, spec)
    return ops, cost, clip


def _check(kernel, spec, n, seed, interpret=False):
    rng = np.random.default_rng(seed)
    q, qlens, t, tlens = _random_batch(rng, n, spec)
    modes = (np.arange(n) % 2).astype(np.int32)
    ops_r, cost_r, clip_r = _reference(q, qlens, t, tlens, modes, spec)
    fused = align_traceback_rows(q, qlens, t, tlens, modes, spec, kernel, interpret=interpret)
    ops_g, cost_g, clip_g = expand_rows_host(fused, q, t, spec)
    np.testing.assert_array_equal(cost_g, cost_r)
    np.testing.assert_array_equal(clip_g, clip_r)
    for i in range(n):
        np.testing.assert_array_equal(ops_g[i], ops_r[i], err_msg=f"alignment {i}")


@pytest.mark.parametrize(
    "spec,n,seed",
    [
        (BandSpec(chunk=48, band=32), 96, 0),
        (BandSpec(chunk=64, band=64), 96, 1),
        (BandSpec(chunk=256, band=128), 32, 2),
    ],
)
def test_rows_traceback_jnp_kernel(spec, n, seed):
    _check("jnp", spec, n, seed)


def test_rows_traceback_pallas_enc_kernel():
    # the int32 Pallas kernel emits the traceback run encoding in-kernel
    _check("pallas", BandSpec(chunk=128, band=128), 32, 4, interpret=True)


def test_rows_traceback_myers_kernel():
    # Myers bit-vector kernel + on-device reconstruction
    _check("myers", BandSpec(chunk=64, band=128), 32, 5, interpret=True)


def test_expand_rows_numpy_matches_native(monkeypatch):
    from hairsplitter_tpu import native

    spec = BandSpec(chunk=64, band=64)
    rng = np.random.default_rng(7)
    n = 64
    q, qlens, t, tlens = _random_batch(rng, n, spec)
    modes = (np.arange(n) % 2).astype(np.int32)
    fused = np.asarray(align_traceback_rows(q, qlens, t, tlens, modes, spec, "jnp"))

    nat = expand_rows_host(fused, q, t, spec)
    monkeypatch.setattr(native, "expand_rows", lambda *a, **k: None)
    pure = expand_rows_host(fused, q, t, spec)
    np.testing.assert_array_equal(nat[1], pure[1])
    np.testing.assert_array_equal(nat[2], pure[2])
    for a, b in zip(nat[0], pure[0]):
        np.testing.assert_array_equal(a, b)


def test_myers_align_device_matches_jnp_kernel():
    from hairsplitter_tpu.ops.align_myers_pallas import myers_align_device

    spec = BandSpec(chunk=64, band=128)
    rng = np.random.default_rng(9)
    q, qlens, t, tlens = _random_batch(rng, 32, spec)
    ref = {k: np.asarray(v) for k, v in banded_align_batch(q, qlens, t, tlens, spec).items()}
    got = {
        k: np.asarray(v)
        for k, v in myers_align_device(q, t, qlens, tlens, spec, interpret=True).items()
    }
    for k in ("bp", "row_at_q", "colmin_val", "colmin_i"):
        np.testing.assert_array_equal(got[k], ref[k])


def test_mapping_device_tb_matches_host_paths():
    """End-to-end: map_reads through the device-traceback bucket path equals
    the pure host path on a small simulated dataset (CPU backend: the device
    path is exercised explicitly via run_jobs' internals)."""
    from dataclasses import replace

    from hairsplitter_tpu.core.mapping import MapConfig, map_reads, run_jobs
    from hairsplitter_tpu.core import mapping as mapping_mod
    from hairsplitter_tpu.utils.sim import random_genome, simulate_reads

    rng = np.random.default_rng(3)
    genome = random_genome(8000, rng)
    sim = simulate_reads(
        [genome], coverage=4, read_len=1500, rng=rng,
        sub_rate=0.04, ins_rate=0.02, del_rate=0.02,
    )
    cfg = MapConfig()
    base = map_reads({"c": genome}, sim.seqs, cfg)

    # force the device-traceback path even on CPU (jnp kernel inside)
    orig = mapping_mod.run_jobs

    def forced(jobs, c):
        return mapping_mod._run_jobs_device_tb(jobs, replace(c, use_pallas=False, use_myers=False))

    mapping_mod.run_jobs = forced
    try:
        dev = map_reads({"c": genome}, sim.seqs, cfg)
    finally:
        mapping_mod.run_jobs = orig
    assert len(base) == len(dev)
    for a, b in zip(base, dev):
        assert (a.read_idx, a.contig, a.strand, a.q_start, a.q_end, a.t_start, a.t_end, a.nm) == (
            b.read_idx, b.contig, b.strand, b.q_start, b.q_end, b.t_start, b.t_end, b.nm
        )
        np.testing.assert_array_equal(a.cigar_ops, b.cigar_ops)
        np.testing.assert_array_equal(a.cigar_lens, b.cigar_lens)
