"""Per-cluster consensus from aligned reads (the polishing step).

Replaces the reference's polishing subprocess ladder — minimap2 → `samtools
consensus -m simple` → minimap2 → racon (or medaka), `src/tools.cpp:317-689` —
with an in-process pileup consensus: per contig position, the majority of the
cluster reads' central bases (deletion-aware), plus insertion recovery (the
majority inserted sequence wherever more than half of the covering reads
insert). Because the reads' alignments to the backbone are already in hand,
no realignment or flank re-trimming (edlib, `create_new_contigs.cpp:556-629`)
is needed: consensus coordinates map 1:1 onto the backbone interval.

The column-majority counting also exists as a jitted device op for batched
use (`majority_counts`); the host path uses numpy directly since group
pileups are small and ragged.
"""

from __future__ import annotations

from collections import Counter

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import GAP, PAD

_ALPHABET_BYTES = np.frombuffer(b"ACGT-N", dtype=np.uint8)


@jax.jit
def majority_counts(codes: jnp.ndarray) -> jnp.ndarray:
    """Counts of {A,C,G,T,-} per column. codes: int8 [R, L], PAD where absent.
    Returns int32 [L, 5]."""
    cands = jnp.arange(5, dtype=codes.dtype)
    return jnp.sum(codes[:, :, None] == cands[None, None, :], axis=0, dtype=jnp.int32)


def consensus_from_cells(
    backbone: np.ndarray,  # int8 contig codes for [start, end]
    start: int,
    rows_cells: list[tuple[np.ndarray, np.ndarray]],  # per read: (tpos, central codes)
    rows_insertions: list[tuple[np.ndarray, np.ndarray]],  # per read: (ins tpos, codes)
    min_cov: int = 1,
    base_caller=None,  # optional fn(counts, cover, ins_rate, backbone) -> bases
) -> str:
    """Build the consensus sequence of one read group over one interval.

    `base_caller` swaps the per-column majority vote for a learned caller
    (the medaka-equivalent NN, models/polisher.py); insertion recovery stays
    rule-based either way."""
    L = len(backbone)
    counts = np.zeros((L, 5), dtype=np.int32)
    cover = np.zeros(L, dtype=np.int32)
    for tpos, cents in rows_cells:
        lo = np.searchsorted(tpos, start)
        hi = np.searchsorted(tpos, start + L)
        idx = tpos[lo:hi] - start
        c = cents[lo:hi]
        counts[idx, c] += 1
        cover[idx] += 1

    if base_caller is not None:
        ins_events = np.zeros(L, dtype=np.int32)
        for ins_tpos, _ in rows_insertions:
            if ins_tpos.size:
                sel = ins_tpos[(ins_tpos >= start) & (ins_tpos < start + L)] - start
                np.add.at(ins_events, np.unique(sel), 1)
        ins_rate = ins_events / np.maximum(cover, 1)
        best = np.asarray(base_caller(counts, cover, ins_rate, backbone))
    else:
        best = counts.argmax(axis=1)
    # no/low coverage -> keep the backbone base
    use_backbone = cover < min_cov
    out_base = np.where(use_backbone, backbone, best)

    # insertion recovery: majority inserted string before position p
    ins_by_pos: dict[int, list[str]] = {}
    for ins_tpos, ins_codes in rows_insertions:
        if ins_tpos.size == 0:
            continue
        sel = (ins_tpos >= start) & (ins_tpos < start + L)
        it, ic = ins_tpos[sel], ins_codes[sel]
        # group consecutive same-position insertions into strings
        if it.size == 0:
            continue
        brk = np.nonzero(np.diff(it) != 0)[0] + 1
        decoded = _ALPHABET_BYTES[ic].tobytes().decode()  # one decode, sliced per segment
        for seg_lo, seg_hi in zip(np.concatenate([[0], brk]), np.concatenate([brk, [it.size]])):
            p = int(it[seg_lo])
            ins_by_pos.setdefault(p, []).append(decoded[seg_lo:seg_hi])

    # vectorized assembly: kept bases become one byte string; the (few)
    # accepted insertion strings are spliced in at their filtered offsets
    keep = (out_base != GAP) & (out_base != PAD)
    base_str = _ALPHABET_BYTES[out_base[keep]].tobytes().decode()
    accepted: list[tuple[int, str]] = []
    for gp, cand in ins_by_pos.items():
        p = gp - start
        if cover[p] >= min_cov and len(cand) * 2 > cover[p]:
            s = sorted(Counter(cand).items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
            accepted.append((p, s.replace("-", "").replace("N", "")))
    if not accepted:
        return base_str
    kept_before = np.concatenate([[0], np.cumsum(keep)])  # filtered offset of p
    accepted.sort()
    pieces: list[str] = []
    last = 0
    for p, s in accepted:
        cut = int(kept_before[p])
        pieces.append(base_str[last:cut])
        pieces.append(s)
        last = cut
    pieces.append(base_str[last:])
    return "".join(pieces)


def polish_iterative(
    draft: str,
    reads: list[str],
    rounds: int = 2,
    map_cfg=None,
    base_caller=None,
    min_len: int = 300,
) -> str:
    """racon-style convergence polish: remap the group's reads to the current
    draft and rebuild the pileup consensus, iterating to a fixpoint.

    The reference converges the same way by chaining subprocesses — minimap2 →
    `samtools consensus` → minimap2 → racon (`src/tools.cpp:317-557`); here
    each round is one batched banded-DP mapping plus the in-process pileup
    vote. Worth the extra rounds only on very noisy reads: the single-pass
    consensus is already exact at ≤10% read error (tests/test_consensus.py),
    but at ~14% substitutions the first-pass backbone alignments smear indels,
    and one remap against the corrected draft recovers them."""
    from ..constants import encode_seq
    from ..core.mapping import MapConfig, map_reads
    from ..pipeline.pileup import alignment_cells_full, orient_read

    cur = draft
    if len(cur) < min_len or not reads:
        return cur
    cfg = map_cfg or MapConfig()
    codes = [encode_seq(r) for r in reads]
    for _ in range(rounds):
        alns = map_reads({"d": cur}, reads, cfg)
        if not alns:
            break
        cells, inss = [], []
        for a in alns:
            oriented = orient_read(codes[a.read_idx], a.strand)
            tpos, tri, it, ic = alignment_cells_full(a, oriented)
            cells.append((tpos, (np.asarray(tri, np.int16) // 25).astype(np.int8)))
            inss.append((it, ic))
        new = consensus_from_cells(
            encode_seq(cur), 0, cells, inss, base_caller=base_caller
        )
        if new == cur or len(new) < min_len:
            break
        cur = new
    return cur
