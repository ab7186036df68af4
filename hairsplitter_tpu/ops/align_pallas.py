"""Pallas TPU kernel for the batched banded edit-distance DP.

Same contract as `ops.align.banded_align_batch` (the portable jnp scan
version), laid out for Mosaic/TPU:

  * 32 chunk alignments ride the sublane axis (exact (32, 128) int8 tiles),
    the W=128 band rides the lane axis,
  * the grid is (batch_groups, rows): TPU grids run sequentially, so the DP
    row carry lives in VMEM scratch across row steps while Pallas pipelines
    the per-row operand DMA,
  * all row-dependent scalars (substitution bit, validity, row==qlen capture,
    j==tlen column flag) are precomputed by XLA into one int8 "plane" tensor
    [rows, N, W] — the kernel does zero dynamic slicing,
  * the intra-row 'D'-run dependency is an exact prefix-min via a log2(W)
    doubling ladder of lane rolls,
  * 2-bit backpointers stream out as aligned [1, 32, 128] uint8 blocks.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .align import INF, BandSpec, BP_DIAG, BP_LEFT, BP_UP

SUBLANES = 32

# plane bits
_SUB = 1  # q[i-1] != t[j-1]
_INVALID = 2  # cell outside [0, tlen] or row beyond qlen
_CAP = 4  # i == qlen: capture this row as row_at_q
_ISCOL = 8  # j == tlen (and valid): track for target-exhausted soft clips


def _encode_planes(q32, t_padded, q_lens, t_lens, spec: BandSpec):
    """XLA-side precompute of the per-(row, chunk, band) bit planes."""
    N, B = q32.shape
    W = spec.band
    dl = spec.dl
    rows = jnp.arange(1, B + 1, dtype=jnp.int32)[None, :, None]  # i
    lanes = jnp.arange(W, dtype=jnp.int32)[None, None, :]  # b
    qlen = q_lens.astype(jnp.int32)[:, None, None]
    tlen = t_lens.astype(jnp.int32)[:, None, None]
    # t char of cell (i, b): t[(i-1) + b] in the dl-padded target.
    # Built in [B, N, W] (no 64MB transpose) with one gather: row i's slab is
    # a W-wide sliding window of the padded target.
    idx = (
        jnp.arange(B, dtype=jnp.int32)[:, None] + jnp.arange(W, dtype=jnp.int32)[None, :]
    )  # [B, W]
    tw = jnp.take(t_padded, idx, axis=1)  # [N, B, W] — the natural layout
    qc = q32[:, :, None]  # [N, B, 1]
    sub = (qc != tw).astype(jnp.int8)
    j = rows + lanes - dl
    invalid = (j < 0) | (j > tlen) | (rows > qlen)
    cap = rows == qlen
    iscol = (lanes == (tlen - rows + dl)) & ~invalid
    enc = (
        sub
        + _INVALID * invalid.astype(jnp.int8)
        + _CAP * cap.astype(jnp.int8)
        + _ISCOL * iscol.astype(jnp.int8)
    )
    return enc  # int8 [N, B, W]


def _dp_kernel(spec: BandSpec, rows_per_step: int):
    B = spec.chunk
    W = spec.band
    n_steps = B // rows_per_step

    def kernel(
        enc_ref,  # int8 [32, RG, W] planes of this row group
        row0_ref,  # int32 [32, W]
        rowq0_ref,  # int32 [32, W]
        bp_ref,  # uint8 [32, RG, W] out
        rowq_ref,  # int32 [32, W] out
        colv_ref,  # int32 [32, 128] out (value in lane 0)
        coli_ref,  # int32 [32, 128] out
        prev,  # scratch int32 [32, W]
        rowq,  # scratch int32 [32, W]
        colv,  # scratch int32 [32, 128]
        coli,  # scratch int32 [32, 128]
    ):
        step = pl.program_id(1)

        @pl.when(step == 0)
        def _init():
            prev[:] = row0_ref[:]
            rowq[:] = rowq0_ref[:]
            colv[:] = jnp.full((SUBLANES, 128), INF, jnp.int32)
            coli[:] = jnp.zeros((SUBLANES, 128), jnp.int32)

        lane = jax.lax.broadcasted_iota(jnp.int32, (SUBLANES, W), dimension=1)

        def row_body(r, carry):
            p, rq, cv, ci = carry
            i = step * rows_per_step + r + 1  # DP row index
            enc = enc_ref[:, r, :].astype(jnp.int32)
            sub = enc & 1
            invalid = (enc >> 1) & 1
            cap = (enc >> 2) & 1
            iscol = (enc >> 3) & 1

            diag = p + sub
            up = jnp.where(lane == W - 1, INF, pltpu.roll(p, W - 1, axis=1)) + 1
            tmp = jnp.minimum(diag, up)
            # exact prefix-min ladder over lanes
            x = tmp - lane
            k = 1
            while k < W:
                shifted = jnp.where(lane >= k, pltpu.roll(x, k, axis=1), INF)
                x = jnp.minimum(x, shifted)
                k *= 2
            row = x + lane
            row = jnp.where(invalid == 1, INF, jnp.minimum(row, INF))
            op = jnp.where(row == diag, BP_DIAG, jnp.where(row == up, BP_UP, BP_LEFT))
            bp_ref[:, r, :] = op.astype(jnp.uint8)

            rq = jnp.where(cap == 1, row, rq)
            colv_here = jnp.min(jnp.where(iscol == 1, row, INF), axis=1, keepdims=True)
            lane0 = (
                jax.lax.broadcasted_iota(jnp.int32, (SUBLANES, 128), dimension=1) == 0
            )
            upd = lane0 & (colv_here < cv)  # [32,1] operands broadcast to lane 0
            cv = jnp.where(upd, colv_here, cv)
            ci = jnp.where(upd, i, ci)
            return row, rq, cv, ci

        # statically unrolled row loop: only static block indexing remains
        carry = (prev[:], rowq[:], colv[:], coli[:])
        for r in range(rows_per_step):
            carry = row_body(r, carry)
        p, rq, cv, ci = carry
        prev[:] = p
        rowq[:] = rq
        colv[:] = cv
        coli[:] = ci

        @pl.when(step == n_steps - 1)
        def _flush():
            rowq_ref[:] = rq
            colv_ref[:] = cv
            coli_ref[:] = ci

    return kernel


@partial(jax.jit, static_argnames=("spec", "interpret", "rows_per_step"))
def banded_align_batch_pallas(
    q: jnp.ndarray,  # int8 [N, B]
    q_lens: jnp.ndarray,  # int32 [N]
    t: jnp.ndarray,  # int8 [N, T]
    t_lens: jnp.ndarray,  # int32 [N]
    spec: BandSpec = BandSpec(),
    interpret: bool = False,
    rows_per_step: int = 8,
):
    """Pallas version of the banded DP; same outputs as the jnp version."""
    N, B = q.shape
    W = spec.band
    dl = spec.dl
    assert N % SUBLANES == 0, f"batch must be a multiple of {SUBLANES}"
    assert B % rows_per_step == 0
    groups = N // SUBLANES
    RG = rows_per_step

    pad_right = B + W - t.shape[1]
    t_padded = jnp.pad(
        t.astype(jnp.int32), ((0, 0), (dl, max(0, pad_right))), constant_values=6
    )
    enc = _encode_planes(q.astype(jnp.int32), t_padded, q_lens, t_lens, spec)

    lanes = jnp.arange(W, dtype=jnp.int32)[None, :]
    tlen2 = t_lens.astype(jnp.int32)[:, None]
    qlen2 = q_lens.astype(jnp.int32)[:, None]
    j0 = lanes - dl
    row0 = jnp.where((j0 >= 0) & (j0 <= tlen2), j0, INF).astype(jnp.int32)
    rowq0 = jnp.where(qlen2 == 0, row0, INF).astype(jnp.int32)

    bp, rowq, colv, coli = pl.pallas_call(
        _dp_kernel(spec, RG),
        grid=(groups, B // RG),
        in_specs=[
            pl.BlockSpec((SUBLANES, RG, W), lambda g, i: (g, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SUBLANES, W), lambda g, i: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SUBLANES, W), lambda g, i: (g, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((SUBLANES, RG, W), lambda g, i: (g, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SUBLANES, W), lambda g, i: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SUBLANES, 128), lambda g, i: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SUBLANES, 128), lambda g, i: (g, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, B, W), jnp.uint8),
            jax.ShapeDtypeStruct((N, W), jnp.int32),
            jax.ShapeDtypeStruct((N, 128), jnp.int32),
            jax.ShapeDtypeStruct((N, 128), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((SUBLANES, W), jnp.int32),
            pltpu.VMEM((SUBLANES, W), jnp.int32),
            pltpu.VMEM((SUBLANES, 128), jnp.int32),
            pltpu.VMEM((SUBLANES, 128), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=25 * N * B * W,
            bytes_accessed=2 * N * B * W + 3 * N * W * 4,
            transcendentals=0,
        ),
    )(enc, row0, rowq0)
    return {
        "bp": bp,  # [N, B, W] — natural layout, no relayout anywhere
        "row_at_q": rowq,
        "colmin_val": colv[:, 0],
        "colmin_i": coli[:, 0],
    }
