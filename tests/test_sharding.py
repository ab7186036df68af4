"""Multi-device mesh tests on the 8-device virtual CPU mesh (SURVEY §5:
contig data parallelism x position/SNP sequence parallelism)."""

import jax
import numpy as np
import pytest

from hairsplitter_tpu.parallel.mesh import (
    make_mesh,
    make_phase_example,
    phase_core,
    phase_shard_step,
)


def test_make_mesh_shapes():
    mesh = make_mesh(8)
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("ctg", "pos")
    mesh4 = make_mesh(4)
    assert mesh4.devices.size == 4


def test_phase_core_single_device():
    example = make_phase_example(C=2, Rr=32, Pp=512, S=32)
    err, counts, labels = jax.jit(phase_core)(*example)
    assert 0.0 < float(err) < 1.0
    assert counts.shape == (2, 512, 125)
    assert labels.shape == (2, 32)


def test_phase_shard_step_matches_unsharded():
    mesh = make_mesh(8)
    ctg, pos = mesh.devices.shape
    example = make_phase_example(C=2 * ctg, Rr=32, Pp=128 * pos, S=8 * pos)
    fn, args = phase_shard_step(mesh, example)
    err_s, counts_s, labels_s = fn(*args)
    # same computation, unsharded
    err_u, counts_u, labels_u = jax.jit(phase_core)(*example)
    assert abs(float(err_s) - float(err_u)) < 1e-5
    np.testing.assert_array_equal(np.asarray(counts_s), np.asarray(counts_u))
    np.testing.assert_array_equal(np.asarray(labels_s), np.asarray(labels_u))
    # outputs keep their shardings
    assert counts_s.sharding.spec[0] == "ctg"


def test_graft_entry_points():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert len(out) == 3
    ge.dryrun_multichip(8)
