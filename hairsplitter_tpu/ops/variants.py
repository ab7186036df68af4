"""Device ops for pileup column statistics and suspect-variant calling.

Batched JAX reformulation of the reference's per-column counting loops
(`src/call_variants.cpp:447-567`): the pileup window is a dense
[reads, positions] tensor of trimer codes; per-column allele counts are a
fused compare-reduce; the suspect rules are vectorized masks. Positions are
processed in fixed-size windows so memory stays bounded regardless of contig
length (the reference's 300 kb chunking / sparse columns serve the same role).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import GAP, N_TRIMERS, TRIMER_ABSENT

_TILE = 512  # position tile inside the counting kernel


@jax.jit
def column_stats(tri: jnp.ndarray):
    """Per-column top-3 allele statistics of a pileup window.

    tri: int8 [R, P] trimer codes, TRIMER_ABSENT where the read is absent.
    Returns (top_codes int32 [P,3], top_counts int32 [P,3], coverage int32 [P]).
    Ties are broken toward the smaller code (deterministic, unlike the
    reference's hash-map ordering)."""
    R, P = tri.shape
    tiles = P // _TILE if P % _TILE == 0 else -1
    assert tiles > 0, "window length must be a multiple of the position tile"

    codes = jnp.arange(N_TRIMERS, dtype=jnp.int8)

    def tile_stats(t):  # t: [R, _TILE]
        counts = jnp.sum(
            (t[:, :, None] == codes[None, None, :]), axis=0, dtype=jnp.int32
        )  # [_TILE, 125]
        # stable top-3 by (count desc, code asc): subtract a tiny code-rank
        key = counts * N_TRIMERS - jnp.arange(N_TRIMERS, dtype=jnp.int32)[None, :]
        topk, topi = jax.lax.top_k(key, 3)
        top_counts = jnp.take_along_axis(counts, topi, axis=1)
        return topi, top_counts

    tri_tiles = tri.reshape(R, tiles, _TILE).transpose(1, 0, 2)  # [tiles, R, _TILE]
    topi, topc = jax.lax.map(tile_stats, tri_tiles)
    coverage = jnp.sum(tri != TRIMER_ABSENT, axis=0, dtype=jnp.int32)
    return topi.reshape(P, 3), topc.reshape(P, 3), coverage


def suspect_mask(
    top_codes,  # int32 [P, 3]
    top_counts,  # int32 [P, 3]
    min_reads,  # scalar int32 (5; 3 for HiFi)
    auto_frac,  # scalar f32 (the -u rescue threshold, default 0.33)
):
    """Suspect / automatic column masks (reference rules, clean trimer decode).

    Rules (`src/call_variants.cpp:526-531`): second allele count above the
    floor, 5x above the third allele, central bases differ, and no deletion
    allele whose two context bases both equal the majority central base
    (indel-adjacent-to-homopolymer guard). Spacing (>5 bp from the previous
    SNP) is enforced by the host, which sees columns in order.

    Pure elementwise math on tiny [P,3] arrays — runs in numpy on host: a
    device round-trip per window block costs far more than the math (two
    pulls per block through the tunnel showed up as ~half of stage 3)."""
    top_codes = np.asarray(top_codes)
    top_counts = np.asarray(top_counts)
    c1, c2, c3 = top_counts[:, 0], top_counts[:, 1], top_counts[:, 2]
    t1, t2 = top_codes[:, 0], top_codes[:, 1]
    central1, central2 = t1 // 25, t2 // 25
    prev1_2, prev2_2 = (t2 // 5) % 5, t2 % 5
    not_homopolymer_indel = (central2 != GAP) | (
        (prev1_2 != central1) & (prev2_2 != central1)
    )
    suspect = (
        (c2 > min_reads)
        & (c2 > 5 * c3)
        & (central1 != central2)
        & not_homopolymer_indel
    )
    automatic = suspect & (c2.astype(np.float32) > np.float32(auto_frac) * c1.astype(np.float32))
    return suspect, automatic


@jax.jit
def window_error_stats(tri: jnp.ndarray, contig_codes: jnp.ndarray):
    """(mismatched cells, covered cells) of a pileup window vs the contig.

    Mirrors the reference's error-rate accumulation over the MSA
    (`src/call_variants.cpp:252-258,434`): every covered cell whose central
    base differs from the contig base (deletions included) is one error."""
    present = tri != TRIMER_ABSENT
    central = (tri.astype(jnp.int32)) // 25
    mism = present & (central != contig_codes[None, :].astype(jnp.int32))
    return jnp.sum(mism, dtype=jnp.int32), jnp.sum(present, dtype=jnp.int32)


def column_stats_host(tri: np.ndarray):
    """Numpy twin of `column_stats` (bit-identical outputs).

    Small windows through a remote-tunneled device lose to dispatch latency
    and per-shape compiles; the host path keeps stage 3 shape-oblivious."""
    R, P = tri.shape
    t = tri.astype(np.int64)
    t[t == TRIMER_ABSENT] = N_TRIMERS  # trash bin
    flat = np.arange(P, dtype=np.int64) * (N_TRIMERS + 1)
    counts = np.bincount(
        (t + flat[None, :]).ravel(), minlength=P * (N_TRIMERS + 1)
    ).reshape(P, N_TRIMERS + 1)[:, :N_TRIMERS]
    key = counts * N_TRIMERS - np.arange(N_TRIMERS, dtype=np.int64)[None, :]
    topi = np.argsort(-key, axis=1, kind="stable")[:, :3].astype(np.int32)
    topc = np.take_along_axis(counts, topi, axis=1).astype(np.int32)
    coverage = counts.sum(axis=1).astype(np.int32)
    return topi, topc, coverage


def window_error_stats_host(tri: np.ndarray, contig_codes: np.ndarray):
    """Numpy twin of `window_error_stats` (bit-identical outputs)."""
    present = tri != TRIMER_ABSENT
    central = tri.astype(np.int32) // 25
    mism = present & (central != contig_codes[None, :].astype(np.int32))
    return int(mism.sum()), int(present.sum())
