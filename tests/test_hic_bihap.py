"""Hi-C untangling and the spectral (BiHap-equivalent) phaser."""

import numpy as np

from hairsplitter_tpu.core.mapping import map_reads
from hairsplitter_tpu.io.gfa import AssemblyGraph, Link
from hairsplitter_tpu.models.bihap import spectral_phase, write_bihap_solution
from hairsplitter_tpu.pipeline.call_variants import call_variants_for_contig
from hairsplitter_tpu.pipeline.hic import (
    interaction_matrix_from_pairs,
    untangle_with_interactions,
)
from hairsplitter_tpu.utils.sim import make_haplotypes, mutate, simulate_reads


def test_hic_untangle_diamond():
    # A and C both feed into shared S which exits to B and D: long reads are
    # too short to resolve it, but Hi-C interactions pair A<->B and C<->D
    g = AssemblyGraph()
    for n in "ABCD":
        g.add_segment(n, "ACGT" * 500, depth=10)
    g.add_segment("S", "TTTT" * 500, depth=20)
    for a, b in (("A", "S"), ("C", "S"), ("S", "B"), ("S", "D")):
        g.add_link(Link(a, "+", b, "+"))
    pairs = [("A", "B")] * 30 + [("C", "D")] * 30 + [("A", "D")] * 2
    im = interaction_matrix_from_pairs(list(g.segments), pairs)
    resolved = untangle_with_interactions(g, im)
    assert resolved == 1
    # S duplicated per matched pair (the original is deleted, like the
    # reference's simple_unzip duplication)
    assert "S" not in g.segments
    assert {"S-copy1", "S-copy2"} <= set(g.segments)
    keys = {(l.name1, l.name2) for l in g.links}
    # each copy carries one (left, right) pairing consistent with Hi-C
    paths = set()
    for s_name in ("S-copy1", "S-copy2"):
        lefts = [a for a, b in keys if b == s_name]
        rights = [b for a, b in keys if a == s_name]
        assert len(lefts) == 1 and len(rights) == 1
        paths.add((lefts[0], rights[0]))
    assert paths == {("A", "B"), ("C", "D")}


def test_spectral_phase_two_haplotypes(rng):
    # BiHap's setting: amplicon-like full-length reads -> a dense read x SNP
    # matrix whose leading singular vector splits the haplotypes
    consensus = make_haplotypes(3000, 1, 0.001, rng)[0]
    hap2, _ = mutate(consensus, 0.01, rng)
    sim = simulate_reads([consensus, hap2], coverage=20, read_len=3000, rng=rng, sub_rate=0.01)
    alns = map_reads({"ctg": consensus}, sim.seqs)
    read_seqs = {i: s for i, s in enumerate(sim.seqs)}
    cv = call_variants_for_contig("ctg", consensus, alns, read_seqs)
    labels = spectral_phase(cv.columns, len(alns), n_haplotypes=2)
    truth = np.array([sim.hap_of_read[a.read_idx] for a in alns])
    present = labels >= 0
    assert present.sum() > 0.8 * len(alns)
    impure = 0
    tot = 0
    for g_ in set(labels[present].tolist()):
        h = truth[labels == g_]
        impure += h.size - np.bincount(h).max()
        tot += h.size
    assert impure <= 0.1 * tot, (impure, tot)


def test_bihap_solution_file(tmp_path):
    p = str(tmp_path / "sol.txt")
    write_bihap_solution(p, "ctg", ["r1", "r2"], np.array([0, 1]))
    txt = open(p).read()
    assert "CONTIG\tctg" in txt and "LABELS\t0,1" in txt
