"""Device-mesh sharding of the phasing core (SPMD over contigs x positions).

The reference is single-node OpenMP: a `parallel for` over contigs with one
critical-section reduction for the global error rate
(`src/call_variants.cpp:1276-1371`). Here the same structure becomes a 2-D
`jax.sharding.Mesh`:

  axis 'ctg'  — data parallelism over contig (chunks), the OpenMP-loop axis;
  axis 'pos'  — sequence parallelism over pileup positions / SNP columns
                (the reference's 300 kb chunking + 2000 bp windowing axis).

Inputs are annotated with NamedSharding and the computation is a single jit:
XLA inserts the collectives — a psum-style all-reduce for the global error
rate and for the sims/diffs contraction over the sharded SNP axis. On a pod
slice, 'ctg' maps across hosts (DCN) and 'pos' across chips (ICI).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..constants import N_TRIMERS, TRIMER_ABSENT


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    # factor n into (ctg, pos) as square as possible
    ctg = 1
    for f in range(int(np.sqrt(n)), 0, -1):
        if n % f == 0:
            ctg = f
            break
    return Mesh(np.asarray(devs).reshape(ctg, n // ctg), ("ctg", "pos"))


def phase_core(pileup, contig_codes, A, R, init_labels, mask):
    """The device phasing step over a batch of contigs.

    pileup:       int8 [C, Rr, Pp] trimer codes (TRIMER_ABSENT = no coverage)
    contig_codes: int8 [C, Pp]
    A, R:         f32 [C, Rr, S] second/majority allele indicators
    init_labels:  int32 [C, Rr]
    mask:         bool [C, Rr]

    Returns (error_rate scalar, counts [C, Pp, 125], labels [C, Rr]).
    """
    present = pileup != TRIMER_ABSENT
    central = pileup.astype(jnp.int32) // 25
    mism = present & (central != contig_codes[:, None, :].astype(jnp.int32))
    # global error rate: reduction over every axis (the reference's
    # omp-critical sum -> an XLA all-reduce over both mesh axes)
    err = jnp.sum(mism, dtype=jnp.float32) / jnp.maximum(
        jnp.sum(present, dtype=jnp.float32), 1.0
    )

    codes = jnp.arange(N_TRIMERS, dtype=pileup.dtype)
    counts = jnp.sum(
        pileup[:, :, :, None] == codes[None, None, None, :], axis=1, dtype=jnp.int32
    )  # [C, Pp, 125] — local to each position shard

    # sims/diffs contract the sharded SNP axis -> XLA inserts the all-reduce
    sim = 3.0 * jnp.einsum("crs,cqs->crq", A, A) + jnp.einsum("crs,cqs->crq", R, R)
    diff = jnp.einsum("crs,cqs->crq", A, R) + jnp.einsum("crs,cqs->crq", R, A)
    eye = jnp.eye(A.shape[1], dtype=jnp.float32)[None]
    sim = sim * (1 - eye)
    diff = diff * (1 - eye)

    # read graph + a fixed number of label-propagation sweeps
    dist = 1.0 - jnp.maximum(0.0, diff - 1.0) / jnp.maximum(sim + diff, 1.0)
    adj = (dist > 1.0 - 2.0 * err) & (sim + diff >= 5.0)
    edge = adj.astype(jnp.float32) * mask[:, None, :] * mask[:, :, None]

    Rr = A.shape[1]
    labels = jnp.where(mask, init_labels, -2)

    def sweep(labels, parity):
        onehot = jax.nn.one_hot(jnp.where(labels >= 0, labels, 0), Rr, dtype=jnp.float32)
        onehot = onehot * (labels >= 0)[:, :, None]
        scores = jnp.einsum("crq,cqk->crk", edge, onehot)
        best = jnp.argmax(scores, axis=-1).astype(labels.dtype)
        best_val = jnp.max(scores, axis=-1)
        upd = mask & (best_val > 0) & ((jnp.arange(Rr)[None, :] % 2) == parity)
        return jnp.where(upd, best, labels), None

    labels, _ = jax.lax.scan(
        lambda l, p: sweep(l, p), labels, jnp.arange(16, dtype=jnp.int32) % 2
    )
    return err, counts, labels


def make_phase_example(C=4, Rr=64, Pp=512, S=64, seed=0):
    rng = np.random.default_rng(seed)
    pileup = rng.integers(0, N_TRIMERS, (C, Rr, Pp)).astype(np.int8)
    pileup[rng.random((C, Rr, Pp)) < 0.3] = TRIMER_ABSENT
    contig_codes = rng.integers(0, 4, (C, Pp)).astype(np.int8)
    A = (rng.random((C, Rr, S)) < 0.2).astype(np.float32)
    R = ((rng.random((C, Rr, S)) < 0.5) & (A == 0)).astype(np.float32)
    init = np.tile(np.arange(Rr, dtype=np.int32), (C, 1))
    mask = np.ones((C, Rr), dtype=bool)
    return pileup, contig_codes, A, R, init, mask


def phase_shard_step(mesh: Mesh, example=None):
    """jit the phase core over the mesh with real shardings; returns
    (compiled fn, device-placed example args)."""
    if example is None:
        example = make_phase_example()
    pileup, contig_codes, A, R, init, mask = example
    s_pileup = NamedSharding(mesh, P("ctg", None, "pos"))
    s_contig = NamedSharding(mesh, P("ctg", "pos"))
    s_AR = NamedSharding(mesh, P("ctg", None, "pos"))  # SNP axis over 'pos'
    s_rows = NamedSharding(mesh, P("ctg", None))
    args = (
        jax.device_put(pileup, s_pileup),
        jax.device_put(contig_codes, s_contig),
        jax.device_put(A, s_AR),
        jax.device_put(R, s_AR),
        jax.device_put(init, s_rows),
        jax.device_put(mask, s_rows),
    )
    fn = jax.jit(
        phase_core,
        in_shardings=(s_pileup, s_contig, s_AR, s_AR, s_rows, s_rows),
        out_shardings=(
            NamedSharding(mesh, P()),
            NamedSharding(mesh, P("ctg", "pos", None)),
            NamedSharding(mesh, P("ctg", None)),
        ),
    )
    return fn, args
