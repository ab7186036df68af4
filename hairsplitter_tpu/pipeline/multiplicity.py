"""Contig multiplicity (ploidy) estimation from coverage + graph topology.

Equivalent of GraphUnzip's `determine_multiplicity`
(`src/GraphUnzip/determine_multiplicity.py:16-241`), used by the reference
when `-c/--haploid-coverage` is given (`hairsplitter.py:704-722`) to cap the
number of haplotypes per contig in stage 4: estimate each contig's copy
number from its depth relative to the haploid coverage, then make the
estimates consistent with the graph (at every junction the trunk multiplicity
should carry the sum of its branches).
"""

from __future__ import annotations

from ..io.gfa import AssemblyGraph


def _neighbors(g: AssemblyGraph, name: str, side: str):
    out = []
    for l in g.links:
        if l.name1 == name and l.orient1 == side:
            out.append(l.name2)
        if l.name2 == name and (("-" if l.orient2 == "+" else "+") == side):
            out.append(l.name1)
    return sorted(set(out))


def estimate_haploid_coverage(g: AssemblyGraph) -> float:
    """Length-weighted median depth of 'simple' contigs (<=1 neighbor per
    side) — the reference's haploid reference coverage from 1-neighbor
    contigs (`determine_multiplicity.py:16-80`)."""
    pairs = []
    for name, seq in g.segments.items():
        if name not in g.depths:
            continue
        if len(_neighbors(g, name, "+")) <= 1 and len(_neighbors(g, name, "-")) <= 1:
            pairs.append((g.depths[name], len(seq)))
    if not pairs:
        pairs = [(g.depths[n], len(g.segments[n])) for n in g.depths]
    if not pairs:
        return 0.0
    pairs.sort()
    total = sum(w for _, w in pairs)
    acc = 0
    for d, w in pairs:
        acc += w
        if acc * 2 >= total:
            return d
    return pairs[-1][0]


def determine_multiplicity(
    g: AssemblyGraph, haploid_coverage: float = 0.0
) -> dict[str, int]:
    """Integer copy number per contig.

    haploid_coverage 0 -> estimated from the graph. A consistency pass nudges
    each contig's multiplicity toward the larger of its two neighbor-side
    sums (greedy propagation like the reference's)."""
    if haploid_coverage <= 0:
        haploid_coverage = estimate_haploid_coverage(g)
    if haploid_coverage <= 0:
        return {n: 1 for n in g.segments}
    mult = {
        n: max(1, round(g.depths.get(n, haploid_coverage) / haploid_coverage))
        for n in g.segments
    }
    for _ in range(3):
        changed = False
        for name in g.segments:
            sums = []
            for side in "+-":
                nb = _neighbors(g, name, side)
                if len(nb) >= 2:
                    sums.append(sum(mult[x] for x in nb if x in mult))
            if sums:
                target = max(sums)
                if target > mult[name]:
                    mult[name] = target
                    changed = True
        if not changed:
            break
    return mult


def write_ploidy(path: str, mult: dict[str, int]) -> None:
    """ploidy.txt: 'contig<TAB>multiplicity' (consumed by stage 4 as the
    haplotype cap, reference `separate_reads.cpp:1442-1458`)."""
    with open(path, "w") as f:
        for name, m in mult.items():
            f.write(f"{name}\t{m}\n")
