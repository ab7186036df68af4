"""Pallas TPU kernel for the Myers bit-vector banded DP.

Mirrors `ops.align_myers.myers_rows_numpy` op for op (same V-init, same
carry-ripple add, same plane slide), laid out for the TPU VPU:

  * each alignment's W=128-cell band is 4 uint32 words riding 4 consecutive
    lanes; 32 alignments tile the lane axis and S more ride sublanes, so one
    [S, 128] vector op advances 32*S alignments x 32 cells - ~32x the DP
    cells per op of the int32-per-lane kernel (`ops/align_pallas.py`),
  * cross-word 1-bit shifts are lane rolls masked at the 4-lane group edges;
    the 128-bit add in the Myers core is a per-word add plus a 3-round
    carry ripple (nw-1 rounds bound the carry chain),
  * the per-symbol match bitvectors (Peq planes, codes 0..3) slide in VMEM
    scratch one bit per row with the next target base injected at the top -
    nothing windowed is ever materialised in HBM,
  * only the P/M delta bitvectors stream out (32 bytes/row - the same bytes
    the old kernel's packed 2-bit backpointers cost); the host adapter
    `myers_to_align_result` reconstructs bit-identical backpointers, scores
    and clip cells.

Replaces the reference's edlib Myers kernel (`src/edlib/src/edlib.cpp`,
calculateBlock ~:220) on its own terms: ~15 bitwise word-ops per 32 cells.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .align import BandSpec, T_SENTINEL

NW = 4  # 128-bit band = 4 uint32 words
LANES = 128
APG = LANES // NW  # alignments per group row (32)


def _pick_sublanes(n_groups_rows: int) -> int:
    # measured on v5e (chunk 256, N 16k): S=64 121 Gcells/s, S=32 98, S=16 74
    for s in (64, 32, 16, 8, 4, 2, 1):
        if n_groups_rows % s == 0:
            return s
    raise ValueError(f"N/32 = {n_groups_rows} not factorable into sublanes")


def _myers_kernel(rows_per_step: int, sublanes: int):
    RG = rows_per_step
    S = sublanes
    u32 = jnp.uint32

    def kernel(
        qb_ref,  # int8 [1, 1, RG, S, 128] query chars (x4 lane broadcast)
        inj_ref,  # int8 [1, 1, RG, S, 128] injected target chars (x4)
        pl_ref,  # uint32 [1, 4, S, 128] initial Peq planes (codes 0..3)
        p_out,  # uint32 [1, 1, S, RG, 128]
        m_out,  # uint32 [1, 1, S, RG, 128]
        Pv,  # scratch uint32 [S, 128]
        Mv,  # scratch uint32 [S, 128]
        planes,  # scratch uint32 [4, S, 128]
    ):
        step = pl.program_id(1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (S, LANES), dimension=1)
        w = lane % NW
        is_w0 = w == 0
        is_w3 = w == NW - 1
        zero = jnp.zeros((S, LANES), u32)
        one31 = jnp.uint32(31)
        one = jnp.uint32(1)

        def shr1(x, top_bits):
            nxt = pltpu.roll(x, LANES - 1, axis=1)  # lane l -> x[l+1]
            carry = jnp.where(is_w3, top_bits, nxt & one) << one31
            return (x >> one) | carry

        def shl1(x, bot_bits):
            prv = pltpu.roll(x, 1, axis=1)  # lane l -> x[l-1]
            carry = jnp.where(is_w0, bot_bits, prv >> one31)
            return (x << one) | carry

        def add128(a, b):
            s = a + b
            carry = (s < a).astype(u32)
            for _ in range(NW - 1):
                cin = jnp.where(is_w0, zero, pltpu.roll(carry, 1, axis=1))
                s = s + cin
                carry = (s < cin).astype(u32)
            return s

        @pl.when(step == 0)
        def _init():
            # V-shaped row 0 (dl = 64): M bits 1..64 set, P bits 65..127 set
            Pv[:] = jnp.where(
                w == 2, jnp.uint32(0xFFFFFFFE), jnp.where(is_w3, jnp.uint32(0xFFFFFFFF), zero)
            )
            Mv[:] = jnp.where(
                is_w0,
                jnp.uint32(0xFFFFFFFE),
                jnp.where(w == 1, jnp.uint32(0xFFFFFFFF), jnp.where(w == 2, one, zero)),
            )
            planes[:] = pl_ref[0]

        P = Pv[:]
        M = Mv[:]
        pls = [planes[c] for c in range(4)]
        for r in range(RG):  # statically unrolled
            qc = qb_ref[0, 0, r].astype(jnp.int32)
            inj = inj_ref[0, 0, r].astype(jnp.int32)
            eq = zero
            for c in range(4):
                eq = eq | jnp.where(qc == c, pls[c], zero)
            # band slide: prev deltas shift right, +1 fills the top
            eP = shr1(P, jnp.broadcast_to(one, (S, LANES)))
            eM = shr1(M, zero)
            # textbook Myers core, hin = +1
            Xv = eq | eM
            s = add128(eq & eP, eP)
            Xh = (s ^ eP) | eq
            Ph = eM | ~(Xh | eP)
            Mh = eP & Xh
            Ph1 = shl1(Ph, jnp.broadcast_to(one, (S, LANES)))
            Mh1 = shl1(Mh, zero)
            P = Mh1 | ~(Xv | Ph1)
            M = Ph1 & Xv
            p_out[0, 0, :, r, :] = P
            m_out[0, 0, :, r, :] = M
            # slide the match planes to the next row's window
            for c in range(4):
                pls[c] = shr1(pls[c], (inj == c).astype(u32))
        Pv[:] = P
        Mv[:] = M
        for c in range(4):
            planes[c] = pls[c]

    return kernel


def _pack_plane_words(t0_bits: jnp.ndarray) -> jnp.ndarray:
    """[N, 128] {0,1} -> [N, 4] uint32 little-endian words, exactly (two
    f32 matmuls of 16-bit halves; every partial sum stays < 2^16)."""
    p = np.arange(LANES)
    half = np.zeros((LANES, 8), np.float32)
    for wi in range(NW):
        for h in range(2):
            lo = 32 * wi + 16 * h
            sel = (p >= lo) & (p < lo + 16)
            half[sel, 2 * wi + h] = 2.0 ** (p[sel] - lo)
    out = jnp.dot(t0_bits.astype(jnp.float32), jnp.asarray(half), preferred_element_type=jnp.float32)
    out = out.astype(jnp.uint32)
    return out[:, 0::2] | (out[:, 1::2] << jnp.uint32(16))


@partial(jax.jit, static_argnames=("spec", "interpret", "rows_per_step", "sublanes"))
def myers_rows_pallas(
    q: jnp.ndarray,  # int8 [N, B]
    t: jnp.ndarray,  # int8 [N, T]
    spec: BandSpec = BandSpec(),
    interpret: bool = False,
    rows_per_step: int = 16,
    sublanes: int | None = None,
):
    """Device Myers row loop; returns (P, M) uint32 [N, B, 4] delta words,
    identical to `myers_rows_numpy`.  Feed to `myers_to_align_result`."""
    N, B = q.shape
    W = spec.band
    assert W == LANES, "Myers kernel is specialised to band=128"
    assert N % APG == 0, f"batch {N} must be a multiple of {APG}"
    dl = spec.dl
    S = sublanes or _pick_sublanes(N // APG)
    G = N // (APG * S)
    RG = rows_per_step
    assert B % RG == 0
    n_steps = B // RG

    pad_right = B + W - t.shape[1]
    t_padded = jnp.pad(t, ((0, 0), (dl, max(0, pad_right))), constant_values=T_SENTINEL)

    def to_stream(x):  # [N, B] -> [n_steps, G, RG, S, 128] with x4 lane bcast
        x = x.reshape(G, S, APG, n_steps, RG).transpose(3, 0, 4, 1, 2)
        return jnp.repeat(x, NW, axis=-1)

    qb = to_stream(q)
    injb = to_stream(t_padded[:, W : W + B])
    t0 = t_padded[:, :W]
    planes0 = jnp.stack(
        [
            _pack_plane_words((t0 == c).astype(jnp.float32)).reshape(G, S, APG * NW)
            for c in range(4)
        ],
        axis=1,
    )  # [G, 4, S, 128]

    p_out, m_out = pl.pallas_call(
        _myers_kernel(RG, S),
        grid=(G, n_steps),
        in_specs=[
            pl.BlockSpec((1, 1, RG, S, LANES), lambda g, i: (i, g, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, RG, S, LANES), lambda g, i: (i, g, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, S, LANES), lambda g, i: (g, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, S, RG, LANES), lambda g, i: (g, i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S, RG, LANES), lambda g, i: (g, i, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, n_steps, S, RG, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((G, n_steps, S, RG, LANES), jnp.uint32),
        ],
        scratch_shapes=[
            pltpu.VMEM((S, LANES), jnp.uint32),
            pltpu.VMEM((S, LANES), jnp.uint32),
            pltpu.VMEM((4, S, LANES), jnp.uint32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * N * B * W,
            bytes_accessed=2 * N * B * (W // 8) + 8 * N * B,
            transcendentals=0,
        ),
    )(qb, injb, planes0)
    return p_out, m_out


def words_from_device(p_out: np.ndarray, spec_chunk: int) -> np.ndarray:
    """[G, n_steps, S, RG, 128] device layout -> [N, B, 4] uint32 words."""
    G, n_steps, S, RG, _ = p_out.shape
    x = p_out.reshape(G, n_steps, S, RG, APG, NW)
    x = x.transpose(0, 2, 4, 1, 3, 5)  # [G, S, APG, n_steps, RG, NW]
    return np.ascontiguousarray(x.reshape(G * S * APG, n_steps * RG, NW))


def _words_from_device_jnp(x: jnp.ndarray) -> jnp.ndarray:
    """jnp twin of `words_from_device`: [G, n_steps, S, RG, 128] kernel
    layout -> [N, B, 4] uint32 delta words."""
    G, n_steps, S, RG, _ = x.shape
    x = x.reshape(G, n_steps, S, RG, APG, NW)
    x = jnp.transpose(x, (0, 2, 4, 1, 3, 5))
    return x.reshape(G * S * APG, n_steps * RG, NW)


def _unpack_bits_jnp(words: jnp.ndarray, W: int) -> jnp.ndarray:
    """[..., nw] uint32 little-endian bitvectors -> [..., W] int32 bits."""
    bits = (words[..., None] >> jnp.arange(32, dtype=jnp.uint32)) & jnp.uint32(1)
    return bits.reshape(*words.shape[:-1], words.shape[-1] * 32)[..., :W].astype(jnp.int32)


def myers_align_device(
    q: jnp.ndarray,  # int8 [N, B]
    t: jnp.ndarray,  # int8 [N, T]
    q_lens: jnp.ndarray,
    t_lens: jnp.ndarray,
    spec: BandSpec = BandSpec(),
    interpret: bool = False,
) -> dict:
    """Myers Pallas kernel + ON-DEVICE reconstruction of the
    `banded_align_batch` outputs (bp plane, row_at_q, colmin) — the jnp twin
    of `ops.align_myers.myers_to_align_result`, same masked formulas, so
    downstream readout/traceback are bit-identical.

    This is what makes the bit-vector kernel the production mapping path:
    the round-2 host adapter materialised the cell matrix in numpy and cost
    more than the device saved (docs/ROADMAP.md); here the unpack + two
    cumsums + masks are a single fused XLA program that runs at HBM
    bandwidth and feeds `traceback_rows_device` without any host round-trip."""
    from .align import INF

    N, B = q.shape
    W = spec.band
    dl = spec.dl
    p_dev, m_dev = myers_rows_pallas(q, t, spec, interpret=interpret)
    P = _words_from_device_jnp(p_dev)
    M = _words_from_device_jnp(m_dev)
    q_lens = q_lens.astype(jnp.int32)
    t_lens = t_lens.astype(jnp.int32)

    delta = _unpack_bits_jnp(P, W) - _unpack_bits_jnp(M, W)  # [N, B, W]
    # per-row anchor C_i[0]; C_0[0] = dl (the V apex is at b = dl)
    score0 = dl + jnp.cumsum(1 + delta[:, :, 0], axis=1)  # rows 1..B
    d = delta.at[:, :, 0].set(0)
    crows = score0[:, :, None] + jnp.cumsum(d, axis=2)

    bar = jnp.arange(W, dtype=jnp.int32)[None, None, :]
    i = jnp.arange(1, B + 1, dtype=jnp.int32)[None, :, None]
    j = i + bar - dl
    valid = (j >= 0) & (j <= t_lens[:, None, None]) & (i <= q_lens[:, None, None])
    C = jnp.where(valid, jnp.minimum(crows, INF), INF).astype(jnp.int32)

    j0 = jnp.arange(W, dtype=jnp.int32)[None, :] - dl
    row0 = jnp.where((j0 >= 0) & (j0 <= t_lens[:, None]), j0, INF).astype(jnp.int32)
    row0 = jnp.broadcast_to(row0, (N, W))
    prev = jnp.concatenate([row0[:, None, :], C[:, :-1, :]], axis=1)

    pad_right = B + W - t.shape[1]
    t_padded = jnp.pad(t, ((0, 0), (dl, max(0, pad_right))), constant_values=T_SENTINEL)
    widx = jnp.arange(B, dtype=jnp.int32)[:, None] + jnp.arange(W, dtype=jnp.int32)[None, :]
    win = jnp.take(t_padded, widx, axis=1)  # [N, B, W]
    sub = (q[:, :, None] != win).astype(jnp.int32)
    diag = prev + sub
    up = jnp.concatenate([prev[:, :, 1:], jnp.full((N, B, 1), INF, jnp.int32)], axis=2) + 1
    from .align import BP_DIAG, BP_LEFT, BP_UP

    bp = jnp.where(C == diag, BP_DIAG, jnp.where(C == up, BP_UP, BP_LEFT)).astype(jnp.uint8)

    # row at i == qlen (row 0 when qlen == 0, mirroring the jnp kernel init)
    idx = jnp.clip(q_lens - 1, 0, B - 1)
    row_at_q = jnp.take_along_axis(C, idx[:, None, None], axis=1)[:, 0]
    row_at_q = jnp.where((q_lens == 0)[:, None], row0, row_at_q)
    row_at_q = jnp.where((q_lens > B)[:, None], INF, row_at_q)

    # best cell of the j == tlen column over rows 1..B (first argmin)
    b_col = t_lens[:, None] - jnp.arange(1, B + 1, dtype=jnp.int32)[None, :] + dl
    ok = (b_col >= 0) & (b_col < W) & (jnp.arange(1, B + 1)[None, :] <= q_lens[:, None])
    colv = jnp.take_along_axis(C, jnp.clip(b_col, 0, W - 1)[:, :, None], axis=2)[:, :, 0]
    colv = jnp.where(ok, colv, INF)
    colmin_i = jnp.argmin(colv, axis=1).astype(jnp.int32)
    colmin_val = jnp.take_along_axis(colv, colmin_i[:, None], axis=1)[:, 0]
    colmin_i = jnp.where(colmin_val >= INF, 0, colmin_i + 1)
    colmin_val = jnp.minimum(colmin_val, INF)

    return {
        "bp": bp,
        "row_at_q": row_at_q,
        "colmin_val": colmin_val,
        "colmin_i": colmin_i,
    }


def banded_align_batch_myers(
    q,
    q_lens,
    t,
    t_lens,
    spec: BandSpec = BandSpec(),
    interpret: bool = False,
    rows_per_step: int = 16,
    sublanes: int | None = None,
):
    """Drop-in replacement for `banded_align_batch`: Myers kernel on device,
    backpointer/score reconstruction on host (bit-identical outputs)."""
    from .align_myers import myers_to_align_result

    p_dev, m_dev = myers_rows_pallas(
        jnp.asarray(q), jnp.asarray(t), spec, interpret=interpret,
        rows_per_step=rows_per_step, sublanes=sublanes,
    )
    P = words_from_device(np.asarray(p_dev), spec.chunk)
    M = words_from_device(np.asarray(m_dev), spec.chunk)
    return myers_to_align_result(P, M, np.asarray(q), np.asarray(t), np.asarray(q_lens), np.asarray(t_lens), spec)
