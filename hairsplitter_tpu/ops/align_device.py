"""Device-side readout + traceback for the banded DP.

Round-1 mapping pulled the packed backpointer plane to the host (32 bytes/row
through a ~30 MB/s tunnel) and walked it in numpy — the profile shows that
transfer + unpack costing 17 of 21 s of a warm mapping run. Here the
end-cell selection (`ops.align.readout`) and the lockstep traceback walk
(`ops.align.traceback_batch`) run on device as vector ops / one `lax.scan`,
so a chunk alignment ships home as ~0.6 KB of expanded CIGAR ops instead of
8 KB of backpointers. Outputs are bit-identical to the host pair (tested).

This is the stage-2 speed path replacing minimap2's base-level alignment
(`hairsplitter.py:629-630`) and edlib's traceback (`src/edlib/`).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .align import (
    BandSpec,
    BP_DIAG,
    BP_LEFT,
    BP_UP,
    INF,
    TB_D,
    TB_EQ,
    TB_I,
    TB_X,
    banded_align_batch,
)


def readout_device(res: dict, q_lens, t_lens, modes, spec: BandSpec):
    """jnp twin of `ops.align.readout` (same masked formulas)."""
    row_at_q = res["row_at_q"]
    colmin_val = res["colmin_val"]
    colmin_i = res["colmin_i"]
    N, W = row_at_q.shape
    dl = spec.dl
    q_lens = q_lens.astype(jnp.int32)
    t_lens = t_lens.astype(jnp.int32)
    bar = jnp.arange(W, dtype=jnp.int32)[None, :]
    j = q_lens[:, None] + bar - dl
    b_corner = t_lens - q_lens + dl
    corner = jnp.take_along_axis(row_at_q, jnp.clip(b_corner, 0, W - 1)[:, None], axis=1)[:, 0]
    corner = jnp.where((b_corner >= 0) & (b_corner < W), corner, INF)
    masked = jnp.where((j >= 0) & (j <= t_lens[:, None]), row_at_q, INF)
    b_row = jnp.argmin(masked, axis=1).astype(jnp.int32)
    rowbest = jnp.take_along_axis(masked, b_row[:, None], axis=1)[:, 0]

    is_ext = modes == 1
    use_col = is_ext & (colmin_val < rowbest)
    cost = jnp.where(is_ext, jnp.minimum(rowbest, colmin_val), corner)
    start_i = jnp.where(use_col, colmin_i, q_lens)
    start_b = jnp.where(use_col, t_lens - colmin_i + dl, jnp.where(is_ext, b_row, b_corner))
    clip = jnp.where(use_col, q_lens - colmin_i, 0)
    return cost, start_i, start_b, clip


def traceback_device(bp, q, t, start_i, start_b, spec: BandSpec):
    """jnp twin of `ops.align.traceback_batch`: a lax.scan lockstep walk.

    Returns ops int8 [N, max_steps] in REVERSED (end-to-start) order with -1
    padding, plus the per-chunk number of emitted steps. Host reverses and
    strips (numpy) — the result equals `traceback_batch` element for element."""
    N, B, W = bp.shape
    dl = spec.dl
    T = t.shape[1]
    max_steps = B + spec.t_width + 1
    bp_flat = bp.reshape(N, B * W)  # keep uint8: the plane can be 10s of MB
    q32 = q.astype(jnp.int32)
    t32 = t.astype(jnp.int32)

    def step(carry, _):
        i, b = carry
        jcol = i + b - dl
        active = (i > 0) | (jcol > 0)
        at_top = active & (i == 0)
        inner = active & ~at_top
        bi = jnp.clip(i - 1, 0, B - 1)
        bpv = jnp.take_along_axis(
            bp_flat, (bi * W + jnp.clip(b, 0, W - 1))[:, None], axis=1
        )[:, 0]
        qi = jnp.take_along_axis(q32, jnp.clip(i - 1, 0, B - 1)[:, None], axis=1)[:, 0]
        tj = jnp.take_along_axis(t32, jnp.clip(jcol - 1, 0, T - 1)[:, None], axis=1)[:, 0]
        diag_op = jnp.where(qi == tj, TB_EQ, TB_X)
        opv = jnp.where(
            at_top,
            TB_D,
            jnp.where(bpv == BP_DIAG, diag_op, jnp.where(bpv == BP_UP, TB_I, TB_D)),
        )
        opv = jnp.where(active, opv, -1)
        move_diag = inner & (bpv == BP_DIAG)
        move_up = inner & (bpv == BP_UP)
        move_left = (inner & (bpv == BP_LEFT)) | at_top
        i2 = i - move_diag.astype(jnp.int32) - move_up.astype(jnp.int32)
        b2 = b + move_up.astype(jnp.int32) - move_left.astype(jnp.int32)
        return (i2, b2), opv.astype(jnp.int8)

    (_, _), ops = jax.lax.scan(
        step, (start_i.astype(jnp.int32), start_b.astype(jnp.int32)), None, length=max_steps
    )
    ops = ops.T  # [N, max_steps], end-to-start order
    n_ops = jnp.sum(ops >= 0, axis=1).astype(jnp.int32)
    return ops, n_ops


@partial(jax.jit, static_argnames=("spec", "use_pallas"))
def align_traceback_device(q, q_lens, t, t_lens, modes, spec: BandSpec, use_pallas: bool = True):
    """One device call per batch: DP kernel + end-cell readout + traceback.

    Returns (ops_rev int8 [N, steps], n_ops [N], cost [N], clip [N]) — the
    only device→host traffic of the mapping hot path."""
    if use_pallas:
        from .align_pallas import banded_align_batch_pallas

        res = banded_align_batch_pallas(q, q_lens, t, t_lens, spec)
    else:
        res = banded_align_batch(q, q_lens, t, t_lens, spec)
    cost, start_i, start_b, clip = readout_device(
        res, q_lens, t_lens, modes.astype(jnp.int32), spec
    )
    ops, n_ops = traceback_device(res["bp"], q, t, start_i, start_b, spec)
    # pack 4 ops per byte: TB codes are 2 bits, -1 padding becomes 0 and is
    # stripped by n_ops — quarters the tunnel transfer per bucket
    N, S = ops.shape
    s4 = -(-S // 4) * 4
    ops_u = jnp.pad(jnp.where(ops < 0, 0, ops).astype(jnp.int32), ((0, 0), (0, s4 - S)))
    shifts = jnp.asarray([1, 4, 16, 64], jnp.int32)
    ops4 = (ops_u.reshape(N, s4 // 4, 4) * shifts).sum(-1).astype(jnp.uint8)
    meta = jnp.stack([n_ops, cost.astype(jnp.int32), clip.astype(jnp.int32)], axis=1)
    # fuse into ONE output buffer: the tunnel charges a fixed sync per pull,
    # so one pull per bucket beats two (meta int32 [N,3] rides as 12 bytes)
    fused = jnp.concatenate([meta.view(jnp.uint8).reshape(N, 12), ops4], axis=1)
    return fused  # one pull per bucket — the only host traffic


def split_fused(fused) -> tuple["np.ndarray", "np.ndarray"]:
    """Host-side split of the fused (meta, ops4) bucket buffer."""
    import numpy as np

    fused = np.asarray(fused)
    meta = fused[:, :12].copy().view(np.int32)
    return unpack_ops4(np.ascontiguousarray(fused[:, 12:])), meta


_OPS4_LUT = None


def unpack_ops4(ops4) -> "np.ndarray":
    """Host-side inverse of the device 4-per-byte CIGAR-op packing (reversed
    op stream; strip with meta's n_ops, then reverse). One 256x4 table
    lookup — ~4x the shift-and-mask unpack."""
    import numpy as np

    global _OPS4_LUT
    if _OPS4_LUT is None:
        b = np.arange(256, dtype=np.uint8)
        _OPS4_LUT = np.stack([(b >> (2 * i)) & 3 for i in range(4)], axis=1).astype(np.int8)
    ops4 = np.asarray(ops4)
    return _OPS4_LUT[ops4].reshape(ops4.shape[0], ops4.shape[1] * 4)
