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


def _myers_kernel(rows_per_step: int, sublanes: int, emit_tb: bool = False, dl: int = 64):
    """emit_tb: also classify every cell's backpointer from the live
    bitvectors and emit two extra bit-packed streams (nonleft, isup) — the
    traceback run information at 2 bits/cell instead of the int16 enc
    plane's 16 (see `myers_traceback_device` for the exactness argument)."""
    RG = rows_per_step
    S = sublanes
    u32 = jnp.uint32

    def kernel(
        qb_ref,  # int8 [1, 1, RG, S, 128] query chars (x4 lane broadcast)
        inj_ref,  # int8 [1, 1, RG, S, 128] injected target chars (x4)
        pl_ref,  # uint32 [1, 4, S, 128] initial Peq planes (codes 0..3)
        p_out,  # uint32 [1, 1, S, RG, 128]
        m_out,  # uint32 [1, 1, S, RG, 128]
        *rest,  # with emit_tb: nl_out, up_out uint32 [1, 1, S, RG, 128]; then scratch
        # Pv scratch uint32 [S, 128]
        # Mv scratch uint32 [S, 128]
        # planes scratch uint32 [4, S, 128]
    ):
        if emit_tb:
            nl_out, up_out, Pv, Mv, planes = rest
        else:
            Pv, Mv, planes = rest
        step = pl.program_id(1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (S, LANES), dimension=1)
        w = lane % NW
        is_w0 = w == 0
        is_w3 = w == NW - 1
        zero = jnp.zeros((S, LANES), u32)
        ones32 = jnp.full((S, LANES), 0xFFFFFFFF, u32)
        base = 32 * w  # cellpos of bit 0 in this lane's word
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
            if emit_tb:
                # per-cell backpointer classification from the live deltas
                # (pre-shift Ph/Mh = C_i[b] - C_{i-1}[b+1], eP/eM =
                # C_{i-1}[b+1] - C_{i-1}[b]):
                #   DIAG <=> (Ph-Mh) + (eP-eM) == (eq ? 0 : 1)
                #   UP   <=> Ph (else), forced at the j==0 column, barred at
                #            the band top (the +1 fill fakes C_{i-1}[W])
                # bit-exact vs the int32 kernel's op on every cell a
                # traceback can reach (proven: j==0 cells are always UP, so
                # the run prefix-max never sees the j<0 sentinel region)
                d1 = (Ph & eM) | (Mh & eP) | (~(Ph | Mh) & ~(eP | eM))
                d0 = (Ph & ~(eP | eM)) | (eP & ~(Ph | Mh))
                diag = (eq & d1) | (~eq & d0)
                i_row = step * RG + r + 1
                off1 = (dl + 1 - i_row) - base  # j >= 1 suffix mask per word
                sh1 = jnp.clip(off1, 0, 31).astype(u32)
                m_ge1 = jnp.where(
                    off1 <= 0, ones32, jnp.where(off1 >= 32, zero, ones32 << sh1)
                )
                pos0 = (dl - i_row) - base  # the j == 0 bit, if in this word
                m_j0 = jnp.where(
                    (pos0 >= 0) & (pos0 < 32),
                    jnp.full((S, LANES), 1, u32) << jnp.clip(pos0, 0, 31).astype(u32),
                    zero,
                )
                top_ok = jnp.where(is_w3, jnp.uint32(0x7FFFFFFF), jnp.uint32(0xFFFFFFFF))
                diag = diag & m_ge1
                up = ((Ph & top_ok) | m_j0) & ~diag
                nl_out[0, 0, :, r, :] = diag | up
                up_out[0, 0, :, r, :] = up
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


@partial(jax.jit, static_argnames=("spec", "interpret", "rows_per_step", "sublanes", "emit_tb"))
def myers_rows_pallas(
    q: jnp.ndarray,  # int8 [N, B]
    t: jnp.ndarray,  # int8 [N, T]
    spec: BandSpec = BandSpec(),
    interpret: bool = False,
    rows_per_step: int = 16,
    sublanes: int | None = None,
    emit_tb: bool = False,
):
    """Device Myers row loop; returns (P, M) uint32 [N, B, 4] delta words,
    identical to `myers_rows_numpy`.  Feed to `myers_to_align_result`.
    With emit_tb, returns (P, M, nonleft, isup) — the two extra streams are
    the bit-packed backpointer classification for `myers_traceback_device`."""
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

    n_out = 4 if emit_tb else 2
    stream_spec = pl.BlockSpec(
        (1, 1, S, RG, LANES), lambda g, i: (g, i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    outs = pl.pallas_call(
        _myers_kernel(RG, S, emit_tb=emit_tb, dl=dl),
        grid=(G, n_steps),
        in_specs=[
            pl.BlockSpec((1, 1, RG, S, LANES), lambda g, i: (i, g, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, RG, S, LANES), lambda g, i: (i, g, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, S, LANES), lambda g, i: (g, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[stream_spec] * n_out,
        out_shape=[
            jax.ShapeDtypeStruct((G, n_steps, S, RG, LANES), jnp.uint32)
        ] * n_out,
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
            flops=(6 if emit_tb else 4) * N * B * W,
            bytes_accessed=n_out * N * B * (W // 8) + 8 * N * B,
            transcendentals=0,
        ),
    )(qb, injb, planes0)
    return tuple(outs)


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


def _mask_le(off: jnp.ndarray) -> jnp.ndarray:
    """uint32 mask of bits [0 .. off] per element (off < 0 -> 0, off >= 31 ->
    all ones); off is int32."""
    full = jnp.uint32(0xFFFFFFFF)
    sh = jnp.clip(off + 1, 0, 31).astype(jnp.uint32)
    return jnp.where(
        off >= 31, full, jnp.where(off < 0, jnp.uint32(0), (jnp.uint32(1) << sh) - 1)
    )


def myers_word_readout(
    P: jnp.ndarray,  # uint32 [N, B, 4] row-delta words
    M: jnp.ndarray,
    q_lens: jnp.ndarray,
    t_lens: jnp.ndarray,
    spec: BandSpec = BandSpec(),
) -> dict:
    """`banded_align_batch`'s readout quantities (row_at_q, colmin) straight
    from the Myers delta WORDS — [N, B]-sized bit extracts and popcounts, so
    the [N, B, W] cell plane of `myers_align_device` never exists. Formulas
    mirror `myers_to_align_result` exactly (bit-identical, tested)."""
    from .align import INF

    N, B, nw = P.shape
    W = spec.band
    dl = spec.dl
    q_lens = q_lens.astype(jnp.int32)
    t_lens = t_lens.astype(jnp.int32)

    # per-row anchor C_i[0] = dl + cumsum(1 + P_i[0] - M_i[0])
    p0 = (P[:, :, 0] & 1).astype(jnp.int32)
    m0 = (M[:, :, 0] & 1).astype(jnp.int32)
    score0 = dl + jnp.cumsum(1 + p0 - m0, axis=1)  # [N, B], rows 1..B

    # row at i == qlen: unpack ONE row per alignment
    idx = jnp.clip(q_lens - 1, 0, B - 1)
    Pq = jnp.take_along_axis(P, idx[:, None, None], axis=1)[:, 0]  # [N, nw]
    Mq = jnp.take_along_axis(M, idx[:, None, None], axis=1)[:, 0]
    dq = _unpack_bits_jnp(Pq, W) - _unpack_bits_jnp(Mq, W)  # [N, W]
    dq = dq.at[:, 0].set(0)
    s0q = jnp.take_along_axis(score0, idx[:, None], axis=1)
    crow = s0q + jnp.cumsum(dq, axis=1)
    bar = jnp.arange(W, dtype=jnp.int32)[None, :]
    jq = q_lens[:, None] + bar - dl
    valid = (jq >= 0) & (jq <= t_lens[:, None])
    row_at_q = jnp.where(valid, jnp.minimum(crow, INF), INF).astype(jnp.int32)
    j0 = bar - dl
    row0 = jnp.where((j0 >= 0) & (j0 <= t_lens[:, None]), j0, INF).astype(jnp.int32)
    row_at_q = jnp.where((q_lens == 0)[:, None], row0, row_at_q)
    row_at_q = jnp.where((q_lens > B)[:, None], INF, row_at_q)

    # j == tlen column: C_i[b_col] = score0_i + popcount-prefix of the row
    # deltas up to b_col (bit 0 excluded — it is the anchor's own delta)
    i = jnp.arange(1, B + 1, dtype=jnp.int32)[None, :]
    b_col = t_lens[:, None] - i + dl  # [N, B]
    base = 32 * jnp.arange(nw, dtype=jnp.int32)[None, None, :]
    m_le = _mask_le(b_col[:, :, None] - base)
    m_le = m_le.at[:, :, 0].set(m_le[:, :, 0] & jnp.uint32(0xFFFFFFFE))
    pc = lambda x: jax.lax.population_count(x).astype(jnp.int32)  # noqa: E731
    colv = score0 + jnp.sum(pc(P & m_le) - pc(M & m_le), axis=2)
    ok = (b_col >= 0) & (b_col < W) & (i <= q_lens[:, None])
    colv = jnp.where(ok, jnp.minimum(colv, INF), INF)
    colmin_i = jnp.argmin(colv, axis=1).astype(jnp.int32)
    colmin_val = jnp.take_along_axis(colv, colmin_i[:, None], axis=1)[:, 0]
    colmin_i = jnp.where(colmin_val >= INF, 0, colmin_i + 1)
    colmin_val = jnp.minimum(colmin_val, INF)
    return {"row_at_q": row_at_q, "colmin_val": colmin_val, "colmin_i": colmin_i}


def traceback_scan_words(nl, up, start_i, start_b):
    """Row-lockstep traceback over the bit-packed (nonleft, isup) streams
    [N, B, 4]: per row, the nearest non-LEFT cell at-or-left-of the current
    band position is the highest set bit of the masked nonleft words — found
    with one clz instead of a 128-lane masked reduce over an int16 enc plane
    (`traceback_scan`). Token semantics identical: d | (up << 7)."""
    N, B, nw = nl.shape
    base = 32 * jnp.arange(nw, dtype=jnp.int32)[None, :]
    nl_rows = jnp.flip(jnp.transpose(nl, (1, 0, 2)), 0)  # [B, N, 4]: rows B..1
    up_rows = jnp.flip(jnp.transpose(up, (1, 0, 2)), 0)
    rr = jnp.arange(B, 0, -1, dtype=jnp.int32)
    si = start_i.astype(jnp.int32)

    def step(b, xs):
        nlw, upw, r = xs
        active = r <= si
        x = nlw & _mask_le(b[:, None] - base)
        # highest set bit over the 4-word vector + the isup bit there, as
        # pure elementwise select chains (a take_along_axis gather per scan
        # step lowered catastrophically: 12 ms of a 14.7 ms call)
        found = jnp.zeros(x.shape[0], bool)
        pos = jnp.zeros(x.shape[0], jnp.int32)
        xw = jnp.zeros(x.shape[0], jnp.uint32)
        uw = jnp.zeros(x.shape[0], jnp.uint32)
        for w in range(nw):  # ascending: the last nonzero word wins
            nz = x[:, w] != jnp.uint32(0)
            found = found | nz
            pos = jnp.where(nz, 32 * w, pos)
            xw = jnp.where(nz, x[:, w], xw)
            uw = jnp.where(nz, upw[:, w], uw)
        hsb = jnp.clip(31 - jax.lax.clz(xw).astype(jnp.int32), 0, 31)
        upbit = (uw >> hsb.astype(jnp.uint32)) & jnp.uint32(1)
        pos = jnp.where(found, pos + hsb, 0)
        upv = jnp.where(found, upbit.astype(jnp.int32), 0)
        d = jnp.maximum(b - pos, 0)
        token = jnp.where(active, d | (upv << 7), 0).astype(jnp.uint8)
        b2 = jnp.where(active, pos + upv, b)
        return b2, token

    _, toks = jax.lax.scan(
        step, start_b.astype(jnp.int32), (nl_rows, up_rows, rr), unroll=8
    )
    return jnp.flip(toks, 0).T  # [N, B]


def myers_traceback_device(
    q: jnp.ndarray,  # int8 [N, B]
    t: jnp.ndarray,
    q_lens: jnp.ndarray,
    t_lens: jnp.ndarray,
    spec: BandSpec = BandSpec(),
    interpret: bool = False,
) -> tuple[dict, jnp.ndarray, jnp.ndarray]:
    """The production fused path: Myers kernel with in-kernel backpointer
    classification (emit_tb) + word-level readout. Returns (readout dict,
    nonleft words, isup words) for `align_traceback_rows` — NOTHING of size
    [N, B, W] is ever materialised, on device or off.

    Exactness: the in-kernel (nonleft, isup) bits equal the int32 kernel's
    op classification on every cell a traceback can visit — visited cells
    satisfy 1 <= i <= start_i <= qlen and the prefix-max a visited cell reads
    only covers lanes with 0 <= j' <= j <= tlen (j is non-increasing along
    the walk), where the pure-bitvector recurrence is exact; the j == 0
    column is forced UP (provably its classification in the masked DP), so
    the j < 0 sentinel region can never capture a run. Matches edlib's
    traceback over its own P/M blocks (`src/edlib/src/edlib.cpp`,
    obtainAlignmentTraceback) rather than re-deriving cell scores."""
    p_dev, m_dev, nl_dev, up_dev = myers_rows_pallas(
        q, t, spec, interpret=interpret, emit_tb=True
    )
    P = _words_from_device_jnp(p_dev)
    M = _words_from_device_jnp(m_dev)
    nl = _words_from_device_jnp(nl_dev)
    upw = _words_from_device_jnp(up_dev)
    res = myers_word_readout(P, M, q_lens, t_lens, spec)
    return res, nl, upw


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
