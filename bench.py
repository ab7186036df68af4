"""Benchmark: banded-alignment DP kernel throughput on the device.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The metric is the core alignment-DP cell rate of the batched banded aligner
(the engine's hot kernel, replacing minimap2/edlib base-level alignment).
vs_baseline compares against the committed `bench_baseline.json` (first
recorded measurement of this same kernel; the reference publishes no numbers
— BASELINE.md)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    import jax

    from hairsplitter_tpu.ops.align import BandSpec, Q_SENTINEL, T_SENTINEL, banded_align_batch
    from hairsplitter_tpu.ops.align_pallas import banded_align_batch_pallas

    on_tpu = jax.devices()[0].platform != "cpu"
    align_fn = banded_align_batch_pallas if on_tpu else banded_align_batch

    spec = BandSpec(chunk=256, band=128)
    N = 512
    rng = np.random.default_rng(0)
    q = rng.integers(0, 4, (N, spec.chunk)).astype(np.int8)
    # targets = queries with 5% errors so the DP follows realistic paths
    t = np.full((N, spec.t_width), T_SENTINEL, dtype=np.int8)
    t[:, : spec.chunk] = np.where(
        rng.random((N, spec.chunk)) < 0.05,
        rng.integers(0, 4, (N, spec.chunk)),
        q,
    )
    q_lens = np.full(N, spec.chunk, np.int32)
    t_lens = np.full(N, spec.chunk, np.int32)

    import jax.numpy as jnp

    iters = 20

    # chain the kernel K times inside one jit so host<->device dispatch
    # latency (large through the axon tunnel) is excluded from the rate
    @jax.jit
    def run_k(q0, ql, t0_, tl):
        def body(i, acc):
            # vary one input byte per iteration to defeat CSE
            qv = q0.at[0, 0].set((i % 4).astype(q0.dtype))
            r = align_fn(qv, ql, t0_, tl, spec)
            return acc + r["row_at_q"][0, 0]

        return jax.lax.fori_loop(0, iters, body, jnp.int32(0))

    jax.block_until_ready(run_k(q, q_lens, t, t_lens))  # compile
    t0 = time.perf_counter()
    jax.block_until_ready(run_k(q, q_lens, t, t_lens))
    dt = time.perf_counter() - t0

    cells = N * spec.chunk * spec.band * iters
    cells_per_s = cells / dt
    bases_per_s = N * spec.chunk * iters / dt

    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_baseline.json")
    vs = 1.0
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            base = json.load(f)
        if base.get("value"):
            vs = cells_per_s / base["value"]

    print(
        json.dumps(
            {
                "metric": "banded_align_DP_cells_per_s",
                "value": round(cells_per_s, 1),
                "unit": "cells/s",
                "vs_baseline": round(vs, 3),
                "detail": {
                    "read_bases_aligned_per_s": round(bases_per_s, 1),
                    "batch": N,
                    "chunk": spec.chunk,
                    "band": spec.band,
                    "kernel": "pallas" if on_tpu else "jnp-scan",
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
