"""Stage 6: untangle the zipped assembly with long-read paths.

In-process equivalent of GraphUnzip's `simple_unzip2` flow as HairSplitter
invokes it (`graphunzip.py unzip -R -e`, reference `hairsplitter.py:815`,
`src/GraphUnzip/simple_unzip.py:818-914`):

  * link support counting from read paths (GAF in the reference; in-memory
    here — `read_GAF_parallel` keeps paths with >=2 contigs),
  * careful removal of read-unsupported links (`remove_unsupported_links`,
    simple_unzip.py:422-453),
  * node duplication: a contig flanked by several supported (left, right)
    neighbor pairs is duplicated into one copy per kept pair — support >= 2;
    a pair is kept if it confirms a yet-unconfirmed link or its support is
    >= 3*smallest+5 (simple_unzip.py:706,721-738) — with coverage split
    proportionally to pair support (:774), iterated to fixpoint,
  * tip removal: dead-ends < 1000 bp and 5x shorter than a sibling branch
    (:458-490),
  * duplicate-link cleanup (`segment.py:646`) and linear-chain merging
    (`finish_untangling.py:200-219,350+`), producing supercontigs whose
    composition is reported like `supercontigs.txt`.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..constants import revcomp
from ..io.gfa import AssemblyGraph, Link


def _flip(o: str) -> str:
    return "-" if o == "+" else "+"


@dataclass
class UnzipResult:
    graph: AssemblyGraph
    supercontigs: dict[str, list[tuple[str, int]]]  # final name -> [(orig contig, orient)]


def _link_key(n1: str, o1: str, n2: str, o2: str) -> tuple:
    a = (n1, o1, n2, o2)
    b = (n2, _flip(o2), n1, _flip(o1))
    return min(a, b)


def _path_links(path: list[tuple[str, int]]):
    for (n1, s1), (n2, s2) in zip(path[:-1], path[1:]):
        o1 = "+" if s1 == 1 else "-"
        o2 = "+" if s2 == 1 else "-"
        yield _link_key(n1, o1, n2, o2)


def count_link_support(read_paths: dict[int, list[tuple[str, int]]]) -> dict[tuple, int]:
    support: dict[tuple, int] = {}
    for path in read_paths.values():
        if len(path) < 2:
            continue
        for k in _path_links(path):
            support[k] = support.get(k, 0) + 1
    return support


def remove_unsupported_links(g: AssemblyGraph, support: dict[tuple, int]) -> int:
    """Careful mode: drop a read-unsupported link only when both of its ends
    have another, supported link (so nothing gets disconnected)."""
    # per (name, orient-end) list of links
    def end_links(name: str, leaving_orient: str) -> list[Link]:
        out = []
        for l in g.links:
            if l.name1 == name and l.orient1 == leaving_orient:
                out.append(l)
            if l.name2 == name and l.orient2 == _flip(leaving_orient):
                out.append(l)
        return out

    removed = 0
    keep: list[Link] = []
    for l in g.links:
        k = _link_key(l.name1, l.orient1, l.name2, l.orient2)
        if support.get(k, 0) > 0:
            keep.append(l)
            continue
        alts1 = [
            x
            for x in end_links(l.name1, l.orient1)
            if support.get(_link_key(x.name1, x.orient1, x.name2, x.orient2), 0) > 0
        ]
        alts2 = [
            x
            for x in end_links(l.name2, _flip(l.orient2))
            if support.get(_link_key(x.name1, x.orient1, x.name2, x.orient2), 0) > 0
        ]
        if alts1 and alts2:
            removed += 1
        else:
            keep.append(l)
    g.links = keep
    return removed


def _neighbors(g: AssemblyGraph, name: str, side: str) -> list[tuple[str, str]]:
    """Neighbors off one side of a contig. side '+': rightward (3') end."""
    out = []
    for l in g.links:
        if l.name1 == name and l.orient1 == side:
            out.append((l.name2, l.orient2))
        if l.name2 == name and _flip(l.orient2) == side:
            out.append((l.name1, _flip(l.orient1)))
    return sorted(set(out))


def duplicate_contigs(
    g: AssemblyGraph,
    read_paths: dict[int, list[tuple[str, int]]],
    min_support: int = 2,
    max_rounds: int = 20,
) -> dict[str, str]:
    """Iteratively duplicate branching contigs per supported neighbor pair.

    Returns copy -> original mapping. Paths are rewritten onto the copies."""
    copy_of: dict[str, str] = {}
    for _ in range(max_rounds):
        changed = False
        for name in list(g.segments.keys()):
            left = _neighbors(g, name, "-")  # entering the 5' end
            right = _neighbors(g, name, "+")
            if len(left) < 2 and len(right) < 2:
                continue
            # count (left, right) pair support from paths traversing name
            pair_count: dict[tuple, int] = {}
            traversals: list[tuple[int, int, tuple | None]] = []
            for ridx, path in read_paths.items():
                for i, (n, s) in enumerate(path):
                    if n != name:
                        continue
                    # orient path so the contig reads '+'
                    prev_e = path[i - 1] if i > 0 else None
                    next_e = path[i + 1] if i + 1 < len(path) else None
                    if s == 0:
                        prev_e, next_e = next_e, prev_e
                        flip = lambda e: (e[0], 1 - e[1]) if e else None
                        prev_e, next_e = flip(prev_e), flip(next_e)
                    lkey = (prev_e[0], "+-"[prev_e[1] == 0]) if prev_e else None
                    rkey = (next_e[0], "+-"[next_e[1] == 0]) if next_e else None
                    if lkey is None and rkey is None:
                        continue
                    pk = (lkey, rkey)
                    pair_count[pk] = pair_count.get(pk, 0) + 1
                    traversals.append((ridx, i, pk))
            # full pairs only decide duplication
            full = {
                (l, r): c
                for (l, r), c in pair_count.items()
                if l is not None and r is not None
            }
            if len(full) < 2:
                continue
            kept = {p: c for p, c in full.items() if c >= min_support}
            if len(kept) < 2:
                continue
            # does the duplication separate anything? (distinct lefts/rights)
            lefts = {p[0] for p in kept}
            rights = {p[1] for p in kept}
            if len(lefts) < 2 and len(rights) < 2:
                continue
            # keep-strongest rule: drop pairs that confirm no new link unless
            # strong (support >= 3*smallest + 5, simple_unzip.py:721-738)
            smallest = min(kept.values())
            confirmed_left: set = set()
            confirmed_right: set = set()
            final_pairs = []
            for p, c in sorted(kept.items(), key=lambda t: -t[1]):
                newness = p[0] not in confirmed_left or p[1] not in confirmed_right
                if newness or c >= 3 * smallest + 5:
                    final_pairs.append((p, c))
                    confirmed_left.add(p[0])
                    confirmed_right.add(p[1])
            if len(final_pairs) < 2:
                continue
            # duplicate
            total = sum(c for _, c in final_pairs)
            depth = g.depths.get(name, 0.0)
            seq = g.segments[name]
            pair_to_copy: dict[tuple, str] = {}
            for k, (p, c) in enumerate(final_pairs):
                cname = f"{name}-copy{k}" if k > 0 else name
                if k > 0:
                    g.add_segment(cname, seq, depth * c / total)
                    copy_of[cname] = copy_of.get(name, name)
                else:
                    g.depths[name] = depth * c / total
                pair_to_copy[p] = cname
            # rewire links: remove old flank links, add per-pair links
            g.links = [l for l in g.links if l.name1 != name and l.name2 != name]
            for (lkey, rkey), cname in pair_to_copy.items():
                if lkey is not None:
                    g.add_link(Link(lkey[0], lkey[1], cname, "+"))
                if rkey is not None:
                    g.add_link(Link(cname, "+", rkey[0], rkey[1]))
            g.dedupe_links()
            # rewrite paths onto the copies
            for ridx, i, pk in traversals:
                target = pair_to_copy.get(pk)
                if target is None:
                    # half traversals follow whichever copy matches their known side
                    cands = [
                        cname
                        for (l, r), cname in pair_to_copy.items()
                        if (pk[0] is None or pk[0] == l) and (pk[1] is None or pk[1] == r)
                    ]
                    target = cands[0] if len(cands) == 1 else None
                if target is not None and target != name:
                    path = read_paths[ridx]
                    n, s = path[i]
                    path[i] = (target, s)
            changed = True
        if not changed:
            break
    return copy_of


def remove_tips(g: AssemblyGraph, min_len: int = 1000, ratio: int = 5) -> int:
    """Remove dead-end tips much shorter than a sibling branch
    (simple_unzip.py:458-490)."""
    removed = 0
    for name in list(g.segments.keys()):
        left = _neighbors(g, name, "-")
        right = _neighbors(g, name, "+")
        if left and right:
            continue  # not a tip
        if not left and not right:
            continue  # isolated contig, keep
        if len(g.segments[name]) >= min_len:
            continue
        anchor_side = "-" if left else "+"
        (anchor, aorient) = _neighbors(g, name, anchor_side)[0]
        # siblings: other branches leaving the same anchor end
        sibs = [
            (n, o)
            for n, o in _neighbors(g, anchor, _flip(aorient))
            if n != name
        ]
        if any(len(g.segments.get(n, "")) > ratio * len(g.segments[name]) for n, o in sibs):
            g.remove_segment(name)
            removed += 1
    return removed


def merge_linear_chains(g: AssemblyGraph) -> dict[str, list[tuple[str, int]]]:
    """Merge unbranched chains into supercontigs (finish_untangling.py:350+).

    Returns final name -> ordered [(constituent, orient)] (supercontigs.txt)."""
    composition: dict[str, list[tuple[str, int]]] = {
        n: [(n, 1)] for n in g.segments
    }
    merged = True
    while merged:
        merged = False
        for l in list(g.links):
            if l.name1 not in g.segments or l.name2 not in g.segments:
                continue
            if l.name1 == l.name2:
                continue
            # mergeable when the joined ends have degree exactly 1 each
            out1 = _neighbors(g, l.name1, l.orient1)
            into2 = _neighbors(g, l.name2, _flip(l.orient2))
            if len(out1) != 1 or len(into2) != 1:
                continue
            s1 = g.segments[l.name1] if l.orient1 == "+" else revcomp(g.segments[l.name1])
            s2 = g.segments[l.name2] if l.orient2 == "+" else revcomp(g.segments[l.name2])
            new_name = f"{l.name1}|{l.name2}"
            comp1 = composition.pop(l.name1)
            comp2 = composition.pop(l.name2)
            if l.orient1 == "-":
                comp1 = [(n, 1 - o) for n, o in reversed(comp1)]
            if l.orient2 == "-":
                comp2 = [(n, 1 - o) for n, o in reversed(comp2)]
            composition[new_name] = comp1 + comp2
            d1, d2 = g.depths.get(l.name1, 0.0), g.depths.get(l.name2, 0.0)
            L1, L2 = len(s1), len(s2)

            # rebuild remaining links by name substitution with orientation map
            def convert(nm, oo):
                if nm == l.name1:
                    return new_name, oo if l.orient1 == "+" else _flip(oo)
                if nm == l.name2:
                    return new_name, oo if l.orient2 == "+" else _flip(oo)
                return nm, oo

            rebuilt = []
            for x in g.links:
                if x is l:
                    continue
                a, ao = convert(x.name1, x.orient1)
                b, bo = convert(x.name2, x.orient2)
                rebuilt.append(Link(a, ao, b, bo, x.cigar))
            del g.segments[l.name1]
            g.depths.pop(l.name1, None)
            del g.segments[l.name2]
            g.depths.pop(l.name2, None)
            g.add_segment(new_name, s1 + s2, (d1 * L1 + d2 * L2) / max(1, L1 + L2))
            g.links = rebuilt
            g.dedupe_links()
            merged = True
            break
    return composition


def unzip(
    g: AssemblyGraph,
    read_paths: dict[int, list[tuple[str, int]]],
    careful: bool = True,
) -> UnzipResult:
    support = count_link_support(read_paths)
    if careful:
        remove_unsupported_links(g, support)
    duplicate_contigs(g, read_paths)
    remove_tips(g)
    g.dedupe_links()
    composition = merge_linear_chains(g)
    return UnzipResult(graph=g, supercontigs=composition)
