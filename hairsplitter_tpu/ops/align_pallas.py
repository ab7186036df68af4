"""Pallas TPU kernel for the batched banded edit-distance DP.

Same contract as `ops.align.banded_align_batch` (the portable jnp scan
version) and bit-identical to it, laid out for Mosaic/TPU:

  * S chunk alignments ride the sublane axis, the W=128 band rides the lane
    axis; the grid is (batch_groups, row_steps) — TPU grids run sequentially,
    so the DP row carry lives in VMEM scratch across row steps while Pallas
    pipelines the per-step operand DMA,
  * the target characters a row needs are a W-wide sliding window that moves
    one base per row: the kernel keeps the window in VMEM scratch and advances
    it with a lane roll + one injected column per row — nothing is gathered
    and no [N, B, W] plane tensor is ever materialised in HBM (an earlier
    XLA-side "plane encode" cost more than the whole DP),
  * the intra-row 'D'-run dependency is an exact prefix-min via a log2(W)
    doubling ladder of lane rolls,
  * 2-bit backpointers stream out as [S, RG, W] uint8 blocks.

This kernel replaces the reference's edlib Myers bit-vector DP
(`src/edlib/`, used at `src/create_new_contigs.cpp:556-629` and
`src/tools.cpp:515-534`) and the base-level extension work minimap2 does for
stage 2 (`hairsplitter.py:629-630`).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .align import INF, BandSpec, BP_DIAG, BP_LEFT, BP_UP

T_SENTINEL32 = 6


def _pick_sublanes(n: int) -> int:
    # larger S amortises per-row op overheads across more sublane tiles
    # (measured on v5e: S=256/512 ≈ 24 Gcells/s vs 17 at S=128); S=512 with
    # RG>16 can exceed the 16MB VMEM scoped limit, so 256 is the default
    for s in (256, 128, 64, 32):
        if n % s == 0:
            return s
    raise ValueError(f"batch size {n} must be a multiple of 32")


def _dp_kernel(spec: BandSpec, rows_per_step: int, sublanes: int, emit_enc: bool = False):
    B = spec.chunk
    W = spec.band
    dl = spec.dl
    RG = rows_per_step
    S = sublanes
    n_steps = B // RG

    def kernel(
        qcol_ref,  # int8 [1, S, RG] query chars of this row group
        inj_ref,  # int8 [1, S, RG] target chars entering the window per row
        t0_ref,  # int8 [S, W] initial target window (row 1)
        qlen_ref,  # int32 [S, 128] query lengths (lane-broadcast)
        tlen_ref,  # int32 [S, 128] target lengths (lane-broadcast)
        bp_ref,  # out [S, RG, W]: uint8 backpointers, or int16 traceback run
        #          encodings when emit_enc (see traceback_rows_device)
        rowq_ref,  # int32 [S, W] out row at i == qlen
        colv_ref,  # int32 [S, 128] out best j==tlen cell value
        coli_ref,  # int32 [S, 128] out its row index
        prev,  # scratch int32 [S, W]
        t_win,  # scratch int32 [S, W]
        rowq,  # scratch int32 [S, W]
        colc,  # scratch int32 [S, W] collected j==tlen column cells
    ):
        step = pl.program_id(1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (S, W), dimension=1)
        last_lane = lane == W - 1
        inf_m_lane = INF - lane  # the INF clamp in x-space (x = D - lane)
        tlen = tlen_ref[:]
        qlen = qlen_ref[:]
        tlen_u = tlen.astype(jnp.uint32)

        # The DP state is carried in x-space (x[b] = D[b] - b): the prefix-min
        # 'D'-run recurrence is a plain running min there, so the per-row
        # ±lane conversions disappear. Equalities (backpointers) and masking
        # are shift-invariant; captures convert back to D once, at flush.
        @pl.when(step == 0)
        def _init():
            j0 = lane - dl
            r0 = jnp.where((j0 >= 0) & (j0 <= tlen), j0, INF)
            prev[:] = r0 - lane
            rowq[:] = jnp.where(qlen == 0, r0 - lane, inf_m_lane)
            t_win[:] = t0_ref[:].astype(jnp.int32)
            colc[:] = inf_m_lane

        def row_body(r, carry):
            p, tw, rq, cc = carry
            i = step * RG + r + 1  # DP row (1-based)
            qc = qcol_ref[0, :, r].astype(jnp.int32).reshape(S, 1)
            sub = jnp.where(tw == qc, 0, 1)
            diag = p + sub
            # D_up[b] = D_prev[b+1] + 1  →  x_up[b] = x_prev[b+1] + 2
            up = jnp.where(last_lane, INF + 1 - (W - 1), pltpu.roll(p, W - 1, axis=1) + 2)
            x = jnp.minimum(diag, up)
            # exact prefix-min ladder over lanes (the 'D'-run recurrence)
            k = 1
            while k < W:
                x = jnp.minimum(x, jnp.where(lane >= k, pltpu.roll(x, k, axis=1), INF))
                k *= 2
            # cells outside [0, tlen] (one unsigned compare: j<0 wraps) or
            # beyond qlen are INF; valid cells clamp at INF
            jv = lane + (i - dl)
            invalid = (jv.astype(jnp.uint32) > tlen_u) | (i > qlen)
            row = jnp.where(invalid, inf_m_lane, jnp.minimum(x, inf_m_lane))
            op = jnp.where(row == diag, BP_DIAG, jnp.where(row == up, BP_UP, BP_LEFT))
            if emit_enc:
                # traceback run encoding (ops/align_device.py): per cell, the
                # (position+1, is_up) of the non-LEFT cell its LEFT-run ends
                # at — a prefix max over lanes, in-kernel where it costs 7
                # roll+max ops instead of an XLA pass over the whole plane
                enc = jnp.where(
                    op != BP_LEFT, ((lane + 1) << 1) | (op == BP_UP).astype(jnp.int32), 0
                )
                k = 1
                while k < W:
                    enc = jnp.maximum(enc, jnp.where(lane >= k, pltpu.roll(enc, k, axis=1), 0))
                    k *= 2
                bp_ref[:, r, :] = enc.astype(jnp.int16)
            else:
                bp_ref[:, r, :] = op.astype(jnp.uint8)

            rq = jnp.where(qlen == i, row, rq)
            # j == tlen column: row i lives at the unique lane tlen - i + dl,
            # so collect into a lane buffer and reduce ONCE at flush (the
            # masked `row` is INF wherever i > qlen, so no extra masking)
            cc = jnp.where(lane == tlen - (i - dl), row, cc)

            inj = inj_ref[0, :, r].astype(jnp.int32).reshape(S, 1)
            tw = jnp.where(last_lane, inj, pltpu.roll(tw, W - 1, axis=1))
            return row, tw, rq, cc

        carry = (prev[:], t_win[:], rowq[:], colc[:])
        for r in range(RG):  # statically unrolled: only static indexing remains
            carry = row_body(r, carry)
        p, tw, rq, cc = carry
        prev[:] = p
        t_win[:] = tw
        rowq[:] = rq
        colc[:] = cc

        @pl.when(step == n_steps - 1)
        def _flush():
            rowq_ref[:] = rq + lane  # back to D-space
            # colmin over the collected column cells; ties pick the earliest
            # row i, i.e. the LARGEST lane (i = tlen + dl - lane)
            ccd = cc + lane
            cv = jnp.min(ccd, axis=1, keepdims=True)
            sel = jnp.max(jnp.where(ccd == cv, lane, -1), axis=1, keepdims=True)
            ci = jnp.where(cv >= INF, 0, tlen[:, :1] + dl - sel)
            colv_ref[:] = jnp.broadcast_to(cv, (S, 128))
            coli_ref[:] = jnp.broadcast_to(ci, (S, 128))

    return kernel


@partial(jax.jit, static_argnames=("spec", "interpret", "rows_per_step", "sublanes", "emit_enc"))
def banded_align_batch_pallas(
    q: jnp.ndarray,  # int8 [N, B]
    q_lens: jnp.ndarray,  # int32 [N]
    t: jnp.ndarray,  # int8 [N, T]
    t_lens: jnp.ndarray,  # int32 [N]
    spec: BandSpec = BandSpec(),
    interpret: bool = False,
    rows_per_step: int = 16,
    sublanes: int | None = None,
    emit_enc: bool = False,
):
    """Pallas version of the banded DP; same outputs as the jnp version.
    With emit_enc, the plane output is the int16 traceback run encoding
    under key 'enc' instead of raw backpointers (same information, ready
    for `traceback_rows_device`)."""
    N, B = q.shape
    W = spec.band
    dl = spec.dl
    S = sublanes or _pick_sublanes(N)
    assert N % S == 0
    RG = rows_per_step
    assert B % RG == 0
    groups = N // S

    # target padded so the sliding window never runs out:
    # row i reads t_padded[(i-1) + b], b in [0, W); injection for row i+1 is
    # t_padded[(i-1) + W]  →  width dl + t + pad >= B + W
    pad_right = B + W - t.shape[1]
    t_padded = jnp.pad(t, ((0, 0), (dl, max(0, pad_right))), constant_values=T_SENTINEL32)
    t0 = t_padded[:, :W]
    # per-row columns, regrouped as [n_steps, N, RG] so blocks satisfy the
    # TPU (sublane, lane) divisibility rule (lane dim == full array dim RG)
    n_steps = B // RG
    qcols = q.reshape(N, n_steps, RG).transpose(1, 0, 2)
    t_inj = t_padded[:, W : W + B].reshape(N, n_steps, RG).transpose(1, 0, 2)
    qlen_b = jnp.broadcast_to(q_lens.astype(jnp.int32)[:, None], (N, 128))
    tlen_b = jnp.broadcast_to(t_lens.astype(jnp.int32)[:, None], (N, 128))

    plane_dtype = jnp.int16 if emit_enc else jnp.uint8
    bp, rowq, colv, coli = pl.pallas_call(
        _dp_kernel(spec, RG, S, emit_enc),
        grid=(groups, B // RG),
        in_specs=[
            pl.BlockSpec((1, S, RG), lambda g, i: (i, g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, RG), lambda g, i: (i, g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, W), lambda g, i: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 128), lambda g, i: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 128), lambda g, i: (g, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((S, RG, W), lambda g, i: (g, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, W), lambda g, i: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 128), lambda g, i: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 128), lambda g, i: (g, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, B, W), plane_dtype),
            jax.ShapeDtypeStruct((N, W), jnp.int32),
            jax.ShapeDtypeStruct((N, 128), jnp.int32),
            jax.ShapeDtypeStruct((N, 128), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((S, W), jnp.int32),
            pltpu.VMEM((S, W), jnp.int32),
            pltpu.VMEM((S, W), jnp.int32),
            pltpu.VMEM((S, W), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=40 * N * B * W,
            bytes_accessed=N * B * W + 2 * N * B + 3 * N * W * 4,
            transcendentals=0,
        ),
    )(qcols, t_inj, t0, qlen_b, tlen_b)
    return {
        ("enc" if emit_enc else "bp"): bp,  # [N, B, W] — natural layout
        "row_at_q": rowq,
        "colmin_val": colv[:, 0],
        "colmin_i": coli[:, 0],
    }
