"""Myers bit-vector formulation of the batched banded edit-distance DP.

The reference's alignment kernel is edlib's bit-parallel Myers algorithm
(`/root/reference/src/edlib/src/edlib.cpp`, calculateBlock ~:220: 64 DP cells
per machine word, ~15 bitwise ops per word-row). This module re-derives that
idea for the *diagonal sliding band* used by `ops.align.banded_align_batch`
and packs the W=128-cell band into 4 uint32 words, so one vector op advances
32x more DP cells than the int32-per-lane kernel in `ops/align_pallas.py`.

Derivation (validated bit-exactly against `banded_align_batch` in
tests/test_align_myers.py):

  * Band coordinates: cell C_i[b] = D(i, j) with j = i + b - dl, b in [0, W).
    Row 0 is initialised V-shaped, C_0[b] = |b - dl|: the j >= 0 half is the
    old kernel's row 0 (= j), and the j < 0 half makes the left sentinel
    region evolve self-consistently as C_i(j) = i - j (every candidate into
    the valid region then costs >= the true value, and the only exact entry
    is the all-insertions column j = 0 = i), so in-band values are exactly
    the old kernel's - no offset.  (A flat C_0[b] = b init would let paths
    *substitute* query chars against left sentinels, which the banded DP
    forbids - that leak is why the V matters.)
  * Row recurrence in band coords: C_i[b] = min(C_i[b-1]+1,
    C_{i-1}[b]+sub, C_{i-1}[b+1]+1) - diag stays at the same b, 'up' moves
    down one lane.  Pre-shifting the previous row's delta bitvectors right by
    one bit (the band slide) turns this into the textbook Myers column step.
  * Top boundary: the shifted-in delta is +1.  Exact: the substituted 'up'
    candidate C_{i-1}[W-1] + 2 never beats the diagonal candidate
    C_{i-1}[W-1] + sub (sub <= 1 < 2), mirroring the old kernel's INF there.
  * Bottom boundary: horizontal input delta hin = +1, i.e. the out-of-band
    cell C_i[-1] := i-1.  Exact: the leaked left candidate into b=0 equals i,
    and C_i[0] <= i always holds in the old kernel (the all-insertions path
    j=0..: dl ins + diagonal steps costs <= i), so the min is unchanged.
  * State per row: P/M delta bitvectors (bit k = C_i[k] - C_i[k-1] for
    k >= 1; bit 0 = C_i[0] - (C_{i-1}[0] + 1), which yields the per-row
    anchor-score recurrence score0_i = score0_{i-1} + 1 + P_i[0] - M_i[0]).
  * The kernel streams only P/M (32 bytes/row - the same bytes the packed
    2-bit backpointers cost); the host adapter reconstructs cell values by
    prefix-summing deltas and re-derives backpointers with the *identical*
    masked formulas of `ops.align`, so `readout`/`traceback_batch` are reused
    unchanged and CIGARs/costs are bit-identical.
"""

from __future__ import annotations

import numpy as np

from .align import INF, BandSpec, T_SENTINEL


def _shr1_words(x: np.ndarray, top_bits: np.ndarray | int) -> np.ndarray:
    """Shift a [..., nw]-uint32 little-endian bitvector right by one bit;
    `top_bits` (0/1) enters as the new bit 31 of the top word."""
    nw = x.shape[-1]
    lo_of_next = np.zeros_like(x)
    lo_of_next[..., : nw - 1] = (x[..., 1:] & np.uint32(1)) << np.uint32(31)
    lo_of_next[..., nw - 1] = np.uint32(top_bits) << np.uint32(31)
    return (x >> np.uint32(1)) | lo_of_next


def _shl1_words(x: np.ndarray, bot_bits: np.ndarray | int) -> np.ndarray:
    """Shift left by one bit; `bot_bits` (0/1) enters as bit 0 of word 0."""
    nw = x.shape[-1]
    hi_of_prev = np.zeros_like(x)
    hi_of_prev[..., 1:] = x[..., : nw - 1] >> np.uint32(31)
    hi_of_prev[..., 0] = np.uint32(bot_bits)
    return (x << np.uint32(1)) | hi_of_prev


def _add_words(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Multi-word unsigned add with the same parallel carry-ripple the TPU
    kernel uses (nw-1 rounds suffice for an nw-word chain)."""
    nw = a.shape[-1]
    s = a + b
    carry = (s < a).astype(np.uint32)
    for _ in range(nw - 1):
        cin = np.zeros_like(carry)
        cin[..., 1:] = carry[..., : nw - 1]
        s = s + cin
        carry = (s < cin).astype(np.uint32)
    return s


def myers_rows_numpy(
    q: np.ndarray,  # int8 [N, B] query codes (Q_SENTINEL padded)
    t: np.ndarray,  # int8 [N, T] target codes (T_SENTINEL padded)
    spec: BandSpec = BandSpec(),
) -> tuple[np.ndarray, np.ndarray]:
    """Word-level reference model of the banded Myers row loop (the TPU
    kernel mirrors this structure op for op).  Returns (P, M) uint32
    [N, B, W//32] row-delta bitvectors."""
    N, B = q.shape
    W = spec.band
    assert W % 32 == 0
    nw = W // 32
    dl = spec.dl
    pad_right = B + W - t.shape[1]
    t_padded = np.pad(t, ((0, 0), (dl, max(0, pad_right))), constant_values=T_SENTINEL)

    # Peq planes for codes 0..3, packed bits of the current W-wide window
    # (sentinels set no plane; a sentinel query char selects no plane)
    win0 = t_padded[:, :W]  # window of row 1
    planes = np.zeros((4, N, nw), dtype=np.uint32)
    weights = (np.uint32(1) << np.arange(32, dtype=np.uint32))[None, None, :]
    for c in range(4):
        bits = (win0 == c).reshape(N, nw, 32).astype(np.uint32)
        planes[c] = (bits * weights).sum(axis=2, dtype=np.uint32)

    # V-shaped row 0: delta bit k = -1 for k <= dl (M), +1 for k > dl (P);
    # bit 0 is never read (the shift uses bits >= 1, the score rows >= 1)
    kbit = np.arange(W)
    P = np.packbits((kbit > dl).astype(np.uint8), bitorder="little")
    P = np.broadcast_to(P.view("<u4"), (N, nw)).copy()
    M = np.packbits(((kbit >= 1) & (kbit <= dl)).astype(np.uint8), bitorder="little")
    M = np.broadcast_to(M.view("<u4"), (N, nw)).copy()
    P_out = np.zeros((N, B, nw), dtype=np.uint32)
    M_out = np.zeros((N, B, nw), dtype=np.uint32)
    ones = np.uint32(0xFFFFFFFF)

    for i in range(1, B + 1):
        qc = q[:, i - 1]
        eq = np.zeros((N, nw), dtype=np.uint32)
        for c in range(4):
            eq |= np.where((qc == c)[:, None], planes[c], np.uint32(0))
        # band slide: shift prev deltas right, top fill +1
        eP = _shr1_words(P, 1)
        eM = _shr1_words(M, 0)
        # textbook Myers core (hin = +1)
        Xv = eq | eM
        s = _add_words(eq & eP, eP)
        Xh = (s ^ eP) | eq
        Ph = eM | ((Xh | eP) ^ ones)
        Mh = eP & Xh
        Ph1 = _shl1_words(Ph, 1)  # hin=+1 enters as Ph bit 0
        Mh1 = _shl1_words(Mh, 0)
        P = Mh1 | ((Xv | Ph1) ^ ones)
        M = Ph1 & Xv
        P_out[:, i - 1] = P
        M_out[:, i - 1] = M
        # slide the match planes to the next row's window
        inj = t_padded[:, (i - 1) + W]
        for c in range(4):
            planes[c] = _shr1_words(planes[c], (inj == c).astype(np.uint32))
    return P_out, M_out


def _unpack_bits(words: np.ndarray, W: int) -> np.ndarray:
    """[..., nw] uint32 little-endian bitvectors -> [..., W] uint8 bits."""
    by = words.astype("<u4").view(np.uint8).reshape(*words.shape[:-1], -1)
    return np.unpackbits(by, axis=-1, bitorder="little")[..., :W]


def myers_to_align_result(
    P: np.ndarray,  # uint32 [N, B, W//32]
    M: np.ndarray,
    q: np.ndarray,  # int8 [N, B]
    t: np.ndarray,  # int8 [N, T]
    q_lens: np.ndarray,
    t_lens: np.ndarray,
    spec: BandSpec = BandSpec(),
) -> dict:
    """Reconstruct the exact `banded_align_batch` outputs (bp, row_at_q,
    colmin_val, colmin_i) from the Myers delta streams, using the identical
    masked candidate formulas so downstream readout/traceback match bit for
    bit."""
    N, B, nw = P.shape
    W = spec.band
    dl = spec.dl
    q_lens = q_lens.astype(np.int64)
    t_lens = t_lens.astype(np.int64)

    Pb = _unpack_bits(P, W).astype(np.int32)
    Mb = _unpack_bits(M, W).astype(np.int32)
    delta = Pb - Mb  # [N, B, W]
    # per-row anchor C_i[0]; C_0[0] = dl (the V apex is at b = dl)
    score0 = dl + np.cumsum(1 + delta[:, :, 0], axis=1, dtype=np.int64)  # rows 1..B
    d = delta.astype(np.int64)
    d[:, :, 0] = 0
    crows = score0[:, :, None] + np.cumsum(d, axis=2)  # old-kernel units

    bar = np.arange(W, dtype=np.int64)[None, None, :]
    i = np.arange(1, B + 1, dtype=np.int64)[None, :, None]
    j = i + bar - dl
    valid = (j >= 0) & (j <= t_lens[:, None, None]) & (i <= q_lens[:, None, None])
    C = np.where(valid, np.minimum(crows, int(INF)), int(INF)).astype(np.int32)

    j0 = np.arange(W, dtype=np.int64)[None, :] - dl
    row0 = np.where((j0 >= 0) & (j0 <= t_lens[:, None]), j0, int(INF)).astype(np.int32)
    prev = np.concatenate([row0[:, None, :], C[:, :-1, :]], axis=1)

    pad_right = B + W - t.shape[1]
    t_padded = np.pad(t, ((0, 0), (dl, max(0, pad_right))), constant_values=T_SENTINEL)
    win = np.lib.stride_tricks.sliding_window_view(t_padded, W, axis=1)[:, :B]
    sub = (q[:, :, None] != win).astype(np.int32)
    diag = prev + sub
    up = np.concatenate([prev[:, :, 1:], np.full((N, B, 1), int(INF), np.int32)], axis=2) + 1
    bp = np.where(C == diag, 0, np.where(C == up, 1, 2)).astype(np.uint8)

    # row at i == qlen (row 0 when qlen == 0, mirroring the jnp kernel init)
    idx = np.clip(q_lens - 1, 0, B - 1)
    row_at_q = C[np.arange(N), idx]
    row_at_q = np.where((q_lens == 0)[:, None], row0, row_at_q)
    row_at_q = np.where((q_lens > B)[:, None], int(INF), row_at_q)

    # best cell of the j == tlen column over rows 1..B (strictly-better
    # update from row 1 upward == first argmin)
    b_col = (t_lens[:, None] - np.arange(1, B + 1)[None, :] + dl).astype(np.int64)
    ok = (b_col >= 0) & (b_col < W) & (np.arange(1, B + 1)[None, :] <= q_lens[:, None])
    colv = np.take_along_axis(
        C, np.clip(b_col, 0, W - 1)[:, :, None], axis=2
    )[:, :, 0]
    colv = np.where(ok, colv, int(INF))
    colmin_i = colv.argmin(axis=1)
    colmin_val = colv[np.arange(N), colmin_i]
    colmin_i = np.where(colmin_val >= int(INF), 0, colmin_i + 1).astype(np.int32)
    colmin_val = np.minimum(colmin_val, int(INF)).astype(np.int32)

    return {
        "bp": bp,
        "row_at_q": row_at_q.astype(np.int32),
        "colmin_val": colmin_val,
        "colmin_i": colmin_i,
    }
