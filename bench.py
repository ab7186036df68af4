"""Benchmark: the PRODUCTION alignment device call + pipeline throughput.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "detail": {...}}

The headline is the cell rate of the production mapping device call — DP +
readout + row-lockstep traceback fused (ops/align_device.py:
align_traceback_rows), with the kernel MapConfig actually ships (the Myers
bit-vector Pallas kernel with in-kernel traceback classification on TPU,
the jnp scan on CPU). Since round 4 the headline IS the user-visible path:
nothing is benchmarked that mapping does not run (VERDICT r3 weak #1).
vs_baseline compares against `bench_baseline.json` (the first recorded
measurement of the then-production DP call; the reference publishes no
numbers — BASELINE.md).

detail also carries pipeline-level numbers the driver can track:
  mapping_read_kbp_per_s   — end-to-end mapping wall throughput
  pipeline_read_kbp_per_s  — warm FULL-pipeline wall throughput on the
                             300 kb 3-strain 30x dataset (VERDICT r3 #8)

Methodology (CLAUDE.md): through the axon tunnel `jax.block_until_ready`
does not reliably block, so all work is forced by a scalar fetch of an
accumulator that data-depends on every call in the stream. Inputs are
device-resident (as in the production mapper); K dependency-chained calls
pipeline their dispatch exactly like the production batch stream, and ONE
final fetch forces the whole chain.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def _bench_batch(spec, N: int):
    """Device-resident operands: queries + 5%-mutated targets so the DP
    follows realistic paths."""
    import jax

    from hairsplitter_tpu.ops.align import T_SENTINEL

    rng = np.random.default_rng(0)
    q = rng.integers(0, 4, (N, spec.chunk)).astype(np.int8)
    t = np.full((N, spec.t_width), T_SENTINEL, dtype=np.int8)
    t[:, : spec.chunk] = np.where(
        rng.random((N, spec.chunk)) < 0.05, rng.integers(0, 4, (N, spec.chunk)), q
    )
    ql = np.full(N, spec.chunk, np.int32)
    tl = np.full(N, spec.chunk, np.int32)
    modes = np.zeros(N, np.int32)
    return tuple(jax.device_put(a) for a in (q, ql, t, tl, modes))


def _time_chained(one, windows: int = 3, iters: int = 10) -> float:
    """Best-of-`windows` of `iters` dependency-chained calls, one forced
    fetch; returns seconds per call."""
    import jax.numpy as jnp

    int(one(jnp.zeros((), jnp.int32)))  # compile + settle
    best = float("inf")
    for _ in range(windows):
        acc = jnp.zeros((), jnp.int32)
        t0 = time.perf_counter()
        for _ in range(iters):
            acc = one(acc)
        int(acc)
        best = min(best, time.perf_counter() - t0)
    return best / iters


def fused_production_rate(spec, kernel: str) -> dict:
    """The headline: the production mapping device call for a large run —
    since round 5 that is the MULTI-BUCKET nibble-packed program
    (`align_traceback_rows_multi_packed`, K 2048-row buckets in one
    dispatch + one pull; `core/mapping.py:_run_jobs_device_tb_multi`).
    The single-bucket call (small remaps) rides along as a detail."""
    import jax
    import jax.numpy as jnp

    from hairsplitter_tpu.ops.align_device import (
        align_traceback_rows_multi_packed,
        align_traceback_rows_packed,
        pack_nibbles_host,
    )

    N = 2048
    K = 16
    B, T = spec.chunk, spec.t_width
    q, ql, t, tl, modes = _bench_batch(spec, N)
    qp1 = pack_nibbles_host(np.asarray(q))
    tp1 = pack_nibbles_host(np.asarray(t))
    qp, tp = (
        jax.device_put(np.stack([a] * K)) for a in (qp1, tp1)
    )
    qlK, tlK, mK = (
        jax.device_put(np.stack([np.asarray(a)] * K)) for a in (ql, tl, modes)
    )
    qp1, tp1 = jax.device_put(qp1), jax.device_put(tp1)

    @jax.jit
    def one_multi(acc):
        f = align_traceback_rows_multi_packed(qp, qlK, tp, tlK, mK, spec, kernel, B, T)
        return acc + f[0, 0, 0].astype(jnp.int32) + f[-1, -1, -1].astype(jnp.int32)

    @jax.jit
    def one_single(acc):
        f = align_traceback_rows_packed(qp1, ql, tp1, tl, modes, spec, kernel, B, T)
        return acc + f[0, 0].astype(jnp.int32) + f[-1, -1].astype(jnp.int32)

    per_multi = _time_chained(one_multi, windows=3, iters=3)
    per_single = _time_chained(one_single)
    return {
        "cells_per_s": round(K * N * spec.chunk * spec.band / per_multi, 1),
        "fused_multi_ms_per_2048_bucket": round(per_multi * 1e3 / K, 2),
        "fused_multi_K": K,
        "fused_single_ms_per_2048": round(per_single * 1e3, 2),
        "fused_single_cells_per_s": round(N * spec.chunk * spec.band / per_single, 1),
        "fused_kernel": kernel,
    }


def tunnel_profile(spec, kernel: str) -> dict:
    """Separate what the TUNNEL costs from what the DEVICE costs (round-4
    verdict weak #9): measures the RPC round-trip latency, the effective
    pull bandwidth on a freshly-computed buffer, and the device-only cost
    of the fused bucket (dependency-chained, pulls amortized), then emits a
    `local_tpu_projection` for a deployment where the chip is local
    (PCIe-class link ~8 GB/s, ~0.2 ms dispatch)."""
    import jax
    import jax.numpy as jnp

    from hairsplitter_tpu.ops.align_device import (
        align_traceback_rows_packed,
        pack_nibbles_host,
    )

    # RPC round-trip: a trivial jitted op, forced scalar fetch
    f8 = jax.jit(lambda a: a + 1)
    acc = jnp.zeros((), jnp.int32)
    int(f8(acc))
    best_rt = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        int(f8(acc))
        best_rt = min(best_rt, time.perf_counter() - t0)

    # pull bandwidth: fetch a freshly-computed ~4.5 MB buffer (device_put
    # round-trips are host-cached and measure nothing)
    g = jax.jit(lambda a: (a + 1).astype(jnp.uint8))
    src = jax.device_put(np.zeros((8192, 544), np.uint8))
    _ = np.asarray(g(src))
    best_pull = float("inf")
    for _ in range(3):
        out = g(src)
        t0 = time.perf_counter()
        _ = np.asarray(out)
        best_pull = min(best_pull, time.perf_counter() - t0)
    nbytes = 8192 * 544
    bw = nbytes / max(best_pull - best_rt, 1e-6)

    # device-only fused bucket cost: chained calls, pulls amortized
    N = 2048
    B, T = spec.chunk, spec.t_width
    q, ql, t, tl, modes = _bench_batch(spec, N)
    qp = jax.device_put(pack_nibbles_host(np.asarray(q)))
    tp = jax.device_put(pack_nibbles_host(np.asarray(t)))

    @jax.jit
    def one(acc):
        f = align_traceback_rows_packed(qp, ql, tp, tl, modes, spec, kernel, B, T)
        return acc + f[0, 0].astype(jnp.int32) + f[-1, -1].astype(jnp.int32)

    dev_per_call = _time_chained(one, windows=3, iters=10)

    bucket_bytes = N * (16 + spec.chunk) + N * (B + T) // 2  # down + packed up
    local_bw = 8e9
    local_dispatch_s = 2e-4
    proj = dev_per_call + local_dispatch_s + bucket_bytes / local_bw
    cells = N * spec.chunk * spec.band
    return {
        "tunnel": {
            "roundtrip_ms": round(best_rt * 1e3, 2),
            "pull_bw_mb_per_s": round(bw / 1e6, 1),
            "device_only_fused_ms_per_2048": round(dev_per_call * 1e3, 2),
        },
        "local_tpu_projection": {
            "assumptions": "local chip: ~0.2 ms dispatch, ~8 GB/s PCIe-class link",
            "fused_ms_per_2048_bucket": round(proj * 1e3, 2),
            "fused_cells_per_s": round(cells / proj, 1),
        },
    }


def raw_kernel_rate(spec, on_tpu: bool) -> dict:
    """The raw DP kernel alone (detail): Myers bit-vector Pallas on TPU at
    N=16384, the jnp scan on CPU at N=512."""
    import jax
    import jax.numpy as jnp

    if on_tpu:
        from hairsplitter_tpu.ops.align_myers_pallas import myers_rows_pallas

        N = 16384
        q, ql, t, tl, _ = _bench_batch(spec, N)

        @jax.jit
        def one(acc):
            p, m = myers_rows_pallas(q, t, spec)
            return acc + p[0, 0, 0, 0, 0].astype(jnp.int32) + m[-1, -1, -1, -1, -1].astype(jnp.int32)

        name = "myers-pallas"
    else:
        from hairsplitter_tpu.ops.align import banded_align_batch

        N = 512
        q, ql, t, tl, _ = _bench_batch(spec, N)

        @jax.jit
        def one(acc):
            r = banded_align_batch(q, ql, t, tl, spec)
            return acc + r["row_at_q"].sum() + r["bp"][0, 0, 0].astype(jnp.int32)

        name = "jnp-scan"
    per_call = _time_chained(one, windows=4)
    return {
        "raw_kernel": name,
        "raw_kernel_cells_per_s": round(N * spec.chunk * spec.band / per_call, 1),
        "raw_kernel_batch": N,
    }


def mapping_kbps(on_tpu: bool) -> dict:
    """End-to-end mapping throughput (read kbp mapped per second, wall
    clock, host orchestration included). Mirrors the BASELINE.md dataset:
    100 kb contig at 36x with 10%-error 8 kb reads (scaled down on CPU)."""
    from hairsplitter_tpu.core.mapping import MapConfig, map_reads
    from hairsplitter_tpu.utils.sim import random_genome, simulate_reads

    rng = np.random.default_rng(1)
    size, cov, rlen = (100_000, 36, 8000) if on_tpu else (20_000, 12, 4000)
    genome = random_genome(size, rng)
    sim = simulate_reads(
        [genome], coverage=cov, read_len=rlen, rng=rng,
        sub_rate=0.05, ins_rate=0.025, del_rate=0.025,
    )
    total_bp = sum(len(s) for s in sim.seqs)
    cfg = MapConfig()
    map_reads({"c": genome}, sim.seqs, cfg)  # compile + settle
    best = float("inf")
    for _ in range(2):  # best-of-2: the tunnel adds multi-second jitter
        t0 = time.perf_counter()
        alns = map_reads({"c": genome}, sim.seqs, cfg)
        best = min(best, time.perf_counter() - t0)
    return {
        "mapping_read_kbp_per_s": round(total_bp / 1e3 / best, 1),
        "mapping_dataset": f"{size//1000}kb x {cov}x, {rlen//1000}kb reads, 10% err",
        "mapping_alignments": len(alns),
    }


def pipeline_kbps(on_tpu: bool) -> dict:
    """Warm full-pipeline wall throughput (VERDICT r3 #8): cold run pays the
    remote compiles, the warm run is the deployment-representative number
    (local-TPU hosts cache compiles). 300 kb x 3 strains x 30x on TPU."""
    from hairsplitter_tpu.io.fasta import write_fasta
    from hairsplitter_tpu.pipeline.orchestrate import PipelineConfig, run_pipeline
    from hairsplitter_tpu.utils import sim as hsim

    length, strains, cov = (300_000, 3, 30) if on_tpu else (40_000, 2, 12)
    rng = np.random.default_rng(7)
    haps = hsim.make_haplotypes(length, strains, 0.01, rng)
    reads = hsim.simulate_reads(
        haps, coverage=cov / strains, read_len=8000, rng=rng,
        sub_rate=0.06, ins_rate=0.02, del_rate=0.02,
    )
    total_kbp = sum(len(s) for s in reads.seqs) / 1e3
    root = tempfile.mkdtemp(prefix="hs_bench_pipe_")
    try:
        asm_path = os.path.join(root, "assembly.fasta")
        reads_path = os.path.join(root, "reads.fasta")
        write_fasta(asm_path, {"asm": haps[0]})
        hsim.write_sim_fasta(reads_path, reads)
        import contextlib

        with open(os.devnull, "w") as null, contextlib.redirect_stdout(null):
            # the pipeline logger prints progress lines; bench.py's contract
            # is ONE JSON line on stdout
            run_pipeline(asm_path, reads_path, os.path.join(root, "out0"), PipelineConfig())
            t0 = time.perf_counter()
            run_pipeline(asm_path, reads_path, os.path.join(root, "out1"), PipelineConfig())
            dt = time.perf_counter() - t0
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return {
        "pipeline_read_kbp_per_s": round(total_kbp / dt, 1),
        "pipeline_warm_wall_s": round(dt, 1),
        "pipeline_dataset": f"{length//1000}kb x {strains} strains, {cov}x, 10% err",
    }


def quality_block(on_tpu: bool) -> dict:
    """Fidelity alongside speed (VERDICT r3 #5): the hard-mode 3-strain mix
    — abundances 1.0/0.3/0.05 (the rare strain at the advertised
    `--rarest-strain-abundance` floor), homopolymer-biased indels, 2%
    chimeric reads — scored for per-strain k-mer recovery and switch
    errors. Mirrors tests/test_stress_quality.py."""
    import contextlib

    from hairsplitter_tpu.io.fasta import write_fasta
    from hairsplitter_tpu.io.gfa import parse_gfa
    from hairsplitter_tpu.pipeline.orchestrate import PipelineConfig, run_pipeline
    from hairsplitter_tpu.utils import sim as hsim
    from hairsplitter_tpu.utils.evaluate import evaluate_phasing

    length, cov = (40_000, 280) if on_tpu else (20_000, 200)
    rng = np.random.default_rng(3)
    haps = hsim.make_haplotypes(length, 3, 0.01, rng)
    reads = hsim.simulate_reads(
        haps, coverage=cov, read_len=8000, rng=rng,
        sub_rate=0.06, ins_rate=0.02, del_rate=0.02,
        abundances=[1.0, 0.3, 0.05], homopolymer_bias=1.0, chimera_rate=0.02,
        uniform_edges=True,
    )
    root = tempfile.mkdtemp(prefix="hs_bench_q_")
    try:
        asm = os.path.join(root, "asm.fa")
        rd = os.path.join(root, "reads.fa")
        write_fasta(asm, {"asm": haps[0]})
        hsim.write_sim_fasta(rd, reads)
        t0 = time.perf_counter()
        with open(os.devnull, "w") as null, contextlib.redirect_stdout(null):
            final = run_pipeline(asm, rd, os.path.join(root, "out"), PipelineConfig())
        dt = time.perf_counter() - t0
        ev = evaluate_phasing(parse_gfa(final).segments, haps)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return {
        "quality": {
            "dataset": f"{length//1000}kb x 3 strains @ 1.0/0.3/0.05, {cov}x base, "
            "hp-biased indels, 2% chimeras",
            "strain_recovery": [round(r, 4) for r in ev.haplotype_recovery],
            "rare_strain_recovery": round(ev.haplotype_recovery[2], 4),
            "switch_errors": ev.total_switch_errors,
            "wall_s": round(dt, 1),
        }
    }


def main():
    import jax

    from hairsplitter_tpu.core.mapping import MapConfig
    from hairsplitter_tpu.ops.align import BandSpec

    on_tpu = jax.devices()[0].platform != "cpu"
    spec = BandSpec(chunk=256, band=128)
    cfg = MapConfig()
    kernel = (
        "myers" if (on_tpu and cfg.use_myers and spec.band == 128)
        else ("pallas" if (on_tpu and cfg.use_pallas) else "jnp")
    )

    fused = fused_production_rate(spec, kernel)
    cells_per_s = fused.pop("cells_per_s")

    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_baseline.json")
    vs = 1.0
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            base = json.load(f)
        if base.get("value"):
            vs = cells_per_s / base["value"]

    detail = {
        "batch": 2048,
        "chunk": spec.chunk,
        "band": spec.band,
        "timing": "device-resident inputs, dependency-chained calls, one forced fetch",
        "headline": "production mapping device call for large runs: K=16 2048-row "
        "buckets of fused DP + readout + traceback in ONE dispatch, nibble-packed "
        "uploads — the exact call core/mapping.py:_run_jobs_device_tb_multi dispatches",
        "device": str(jax.devices()[0]),
        **fused,
    }
    # each extra block is best-effort: remote compiles through the tunnel
    # can stall for minutes under service congestion, and the driver must
    # always get its one JSON line. Budget ~20 min total.
    t_start = time.perf_counter()
    budget_s = 1200.0
    for name, block in (
        ("tunnel", tunnel_profile),
        ("raw_kernel", raw_kernel_rate),
        ("mapping", mapping_kbps),
        ("pipeline", pipeline_kbps),
        ("quality", quality_block),
    ):
        if time.perf_counter() - t_start > budget_s:
            detail[name + "_skipped"] = "bench time budget exhausted"
            continue
        try:
            if block is raw_kernel_rate:
                detail.update(block(spec, on_tpu))
            elif block is tunnel_profile:
                if on_tpu:
                    detail.update(block(spec, kernel))
            else:
                detail.update(block(on_tpu))
        except Exception as e:  # noqa: BLE001
            detail[name + "_error"] = f"{type(e).__name__}: {e}"[:200]

    print(
        json.dumps(
            {
                "metric": "banded_align_DP_cells_per_s",
                "value": cells_per_s,
                "unit": "cells/s",
                "vs_baseline": round(vs, 3),
                "detail": detail,
            }
        )
    )


if __name__ == "__main__":
    main()
