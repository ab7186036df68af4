"""Stage 1 (opt-in `--correct-assembly`): assembly correction before splitting.

Equivalent of the reference's GenomeTailor (`src/HS_GenomeTailor/scaffold.cpp`):
iteratively edit the assembly graph until reads align end-to-end. Detected
evidence, as in the reference:

  * bridges — a read whose alignment jumps from the middle/end of one contig
    to another mid-read (`inventoriate_bridges_and_piers`, scaffold.cpp:341):
    the junction gets a link, and contigs are cut at mid-contig junction
    points;
  * piers — a read whose alignment stops abruptly inside a contig
    (breakpoint): with enough support the contig is cut there.

Evidence is pooled per position window and requires >=5 supporting reads
(scaffold.cpp:1926,2231). A before/after table of end-to-end aligned reads is
reported like the reference's self-metric (scaffold.cpp:2304-2357).

Bridge junctions with read sequence between the contigs are gap-filled with a
representative read insert (the reference racon-polishes these), and reads
that align nowhere are reassembled into new contigs with the greedy overlap
assembler (`core/assembler.py`, the reference shells out to raven,
scaffold.cpp:154,2160-2166).
"""

from __future__ import annotations

from collections import defaultdict
from dataclasses import dataclass, field

import numpy as np

from ..core.datatypes import Alignment
from ..core.mapping import MapConfig, map_reads
from ..io.gfa import AssemblyGraph, Link


@dataclass
class TailorConfig:
    min_support: int = 5
    end_margin: int = 150  # clip tolerance at read/contig ends
    window: int = 100  # breakpoint pooling window
    max_junction_gap: int = 500  # read-side gap allowed inside a bridge
    min_junction_fill: int = 20  # junction inserts shorter than this become 0M links
    reassemble_unaligned: bool = True  # assemble never-aligning reads into new contigs
    min_unaligned_contig: int = 1000


@dataclass
class TailorReport:
    end_to_end_before: int = 0
    end_to_end_after: int = 0
    n_reads: int = 0
    cuts: list[tuple[str, int]] = field(default_factory=list)
    new_links: list[tuple] = field(default_factory=list)
    unaligned_reads: int = 0
    reassembled_contigs: int = 0


def _is_end_to_end(a: Alignment, read_len: int, contig_len: int, margin: int) -> bool:
    """Read aligned end-to-end: every read end is either near the read
    boundary or hangs off a contig end."""
    left_ok = a.q_start <= margin or (a.t_start <= margin if a.strand == 1 else contig_len - a.t_end <= margin)
    right_ok = (
        read_len - a.q_end <= margin
        or (contig_len - a.t_end <= margin if a.strand == 1 else a.t_start <= margin)
    )
    return left_ok and right_ok


def _collect_breakpoints(
    alns_by_read: dict[int, list[Alignment]],
    read_lens: dict[int, str],
    contig_lens: dict[str, int],
    cfg: TailorConfig,
):
    """Breakpoint and bridge evidence from read alignments."""
    bp_votes: dict[str, list[int]] = defaultdict(list)  # contig -> positions
    # (c1, side1, c2, side2) -> [(read, junction q-interval)]
    bridge_votes: dict[tuple, list] = defaultdict(list)
    for ridx, alns in alns_by_read.items():
        L = read_lens[ridx]
        alns = sorted(alns, key=lambda a: a.q_start)
        for a in alns:
            cl = contig_lens[a.contig]
            # pier: read continues but the alignment stops inside the contig
            if a.strand == 1:
                ends = [(a.q_start, a.t_start, "start"), (L - a.q_end, cl - a.t_end, "end")]
            else:
                ends = [(a.q_start, cl - a.t_end, "end"), (L - a.q_end, a.t_start, "start")]
            for read_overhang, contig_rest, side in ends:
                if read_overhang > cfg.end_margin and contig_rest > cfg.end_margin:
                    pos = a.t_end if (side == "end") == (a.strand == 1) else a.t_start
                    bp_votes[a.contig].append(int(pos))
        # bridges: consecutive alignments on the read; the read sequence
        # between them is the junction gap (reference gap-fills with racon,
        # scaffold.cpp; here: representative insert, consensus-grade for
        # accurate reads)
        for a1, a2 in zip(alns[:-1], alns[1:]):
            if a2.q_start - a1.q_end > cfg.max_junction_gap:
                continue
            if a1.contig == a2.contig:
                continue
            # which end of each contig faces the junction
            side1 = "+" if a1.strand == 1 else "-"  # leaving a1 through its aligned end
            side2 = "+" if a2.strand == 1 else "-"
            flip = {"+": "-", "-": "+"}
            fwd = (a1.contig, side1, a2.contig, side2)
            rev = (a2.contig, flip[side2], a1.contig, flip[side1])
            # canonicalize so both read strands vote for the same junction;
            # flipped evidence contributes its insert reverse-complemented
            if fwd <= rev:
                bridge_votes[fwd].append((ridx, a1.q_end, a2.q_start, False))
            else:
                bridge_votes[rev].append((ridx, a1.q_end, a2.q_start, True))
    return bp_votes, bridge_votes


def _pool_positions(votes: list[int], window: int, min_support: int) -> list[int]:
    votes = sorted(votes)
    out = []
    i = 0
    while i < len(votes):
        j = i
        while j < len(votes) and votes[j] - votes[i] <= window:
            j += 1
        if j - i >= min_support:
            out.append(int(np.median(votes[i:j])))
        i = j
    return out


def correct_assembly(
    assembly: AssemblyGraph,
    read_seqs: dict[int, str],
    map_cfg: MapConfig = MapConfig(),
    cfg: TailorConfig = TailorConfig(),
) -> tuple[AssemblyGraph, TailorReport]:
    """Detect and correct assembly errors so reads align end-to-end."""
    report = TailorReport(n_reads=len(read_seqs))
    seqs = [read_seqs[i] for i in sorted(read_seqs)]
    idxs = sorted(read_seqs)
    alns = map_reads(assembly.segments, seqs, map_cfg, read_indices=idxs)
    alns_by_read: dict[int, list[Alignment]] = defaultdict(list)
    for a in alns:
        alns_by_read[a.read_idx].append(a)
    read_lens = {i: len(read_seqs[i]) for i in read_seqs}
    contig_lens = {n: len(s) for n, s in assembly.segments.items()}
    report.unaligned_reads = len(read_seqs) - len(alns_by_read)
    report.end_to_end_before = sum(
        1
        for ridx, al in alns_by_read.items()
        if any(_is_end_to_end(a, read_lens[ridx], contig_lens[a.contig], cfg.end_margin) for a in al)
        or _spans_via_bridge(al, read_lens[ridx], cfg)
    )

    bp_votes, bridge_votes = _collect_breakpoints(alns_by_read, read_lens, contig_lens, cfg)

    # 1. cut contigs at well-supported internal breakpoints
    out = AssemblyGraph()
    piece_of: dict[str, list[tuple[str, int, int]]] = {}  # contig -> [(piece, start, end)]
    for name, seq in assembly.segments.items():
        cuts = _pool_positions(bp_votes.get(name, []), cfg.window, cfg.min_support)
        cuts = [c for c in cuts if cfg.end_margin < c < len(seq) - cfg.end_margin]
        bounds = [0] + sorted(set(cuts)) + [len(seq)]
        pieces = []
        for k, (lo, hi) in enumerate(zip(bounds[:-1], bounds[1:])):
            pname = name if len(bounds) == 2 else f"{name}&{k}"
            out.add_segment(pname, seq[lo:hi], assembly.depths.get(name))
            pieces.append((pname, lo, hi))
            if k > 0:
                report.cuts.append((name, lo))
        piece_of[name] = pieces

    # original links re-attach to terminal pieces; cut points stay linked so
    # the original walk is preserved
    for name, pieces in piece_of.items():
        for (p1, _, _), (p2, _, _) in zip(pieces[:-1], pieces[1:]):
            out.add_link(Link(p1, "+", p2, "+", "0M"))
    for l in assembly.links:
        n1 = piece_of[l.name1][-1][0] if l.orient1 == "+" else piece_of[l.name1][0][0]
        n2 = piece_of[l.name2][0][0] if l.orient2 == "+" else piece_of[l.name2][-1][0]
        out.add_link(Link(n1, l.orient1, n2, l.orient2, l.cigar))

    # 2. add bridge links with enough support; junctions with sequence in
    # between get a gap-fill contig built from the median-length read insert
    existing = {l.key() for l in out.links}
    for (c1, s1, c2, s2), evidence in bridge_votes.items():
        n = len(evidence)
        if n < cfg.min_support:
            continue
        p1 = piece_of[c1][-1][0] if s1 == "+" else piece_of[c1][0][0]
        p2 = piece_of[c2][0][0] if s2 == "+" else piece_of[c2][-1][0]
        gaps = sorted(evidence, key=lambda e: e[2] - e[1])
        med_len = gaps[len(gaps) // 2][2] - gaps[len(gaps) // 2][1]
        if med_len >= cfg.min_junction_fill:
            ridx, qlo, qhi, flipped = gaps[len(gaps) // 2]
            from ..constants import revcomp

            fill = read_seqs[ridx][qlo:qhi]
            if flipped:
                fill = revcomp(fill)
            jname = f"junction_{p1}_{p2}"
            out.add_segment(jname, fill, depth=float(n))
            link1 = Link(p1, s1, jname, "+", "0M")
            link2 = Link(jname, "+", p2, s2, "0M")
            for link in (link1, link2):
                if link.key() not in existing:
                    out.add_link(link)
                    existing.add(link.key())
            report.new_links.append((p1, s1, p2, s2, n))
        else:
            link = Link(p1, s1, p2, s2, "0M")
            if link.key() not in existing:
                out.add_link(link)
                existing.add(link.key())
                report.new_links.append((p1, s1, p2, s2, n))
    out.dedupe_links()

    # 3. reassemble reads that aligned nowhere into new contigs
    if cfg.reassemble_unaligned:
        unaligned = {
            f"u{ridx}": read_seqs[ridx]
            for ridx in read_seqs
            if ridx not in alns_by_read and len(read_seqs[ridx]) >= 500
        }
        if len(unaligned) >= cfg.min_support:
            from ..core.assembler import greedy_assemble

            new_contigs = greedy_assemble(unaligned, min_len=cfg.min_unaligned_contig)
            for k, seq in enumerate(new_contigs):
                out.add_segment(f"reassembled_{k}", seq, depth=0.0)
            report.reassembled_contigs = len(new_contigs)

    # re-map against the corrected assembly for the after-metric
    alns2 = map_reads(out.segments, seqs, map_cfg, read_indices=idxs)
    by_read2: dict[int, list[Alignment]] = defaultdict(list)
    for a in alns2:
        by_read2[a.read_idx].append(a)
    contig_lens2 = {n: len(s) for n, s in out.segments.items()}
    report.end_to_end_after = sum(
        1
        for ridx, al in by_read2.items()
        if any(_is_end_to_end(a, read_lens[ridx], contig_lens2[a.contig], cfg.end_margin) for a in al)
        or _spans_via_bridge(al, read_lens[ridx], cfg)
    )
    return out, report


def _spans_via_bridge(alns: list[Alignment], read_len: int, cfg: TailorConfig) -> bool:
    """Read covered end-to-end by a chain of alignments with small gaps."""
    alns = sorted(alns, key=lambda a: a.q_start)
    if not alns or alns[0].q_start > cfg.end_margin:
        return False
    reach = alns[0].q_end
    for a in alns[1:]:
        if a.q_start - reach > cfg.max_junction_gap:
            return False
        reach = max(reach, a.q_end)
    return read_len - reach <= cfg.end_margin
