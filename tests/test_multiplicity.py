from hairsplitter_tpu.io.gfa import AssemblyGraph, Link
from hairsplitter_tpu.pipeline.multiplicity import (
    determine_multiplicity,
    estimate_haploid_coverage,
)


def _diamond():
    # trunk T (depth 40) splits into A, B (20 each) and rejoins at T2 (40)
    g = AssemblyGraph()
    g.add_segment("T", "A" * 5000, depth=40)
    g.add_segment("A", "C" * 5000, depth=20)
    g.add_segment("B", "G" * 5000, depth=21)
    g.add_segment("T2", "T" * 5000, depth=39)
    g.add_link(Link("T", "+", "A", "+"))
    g.add_link(Link("T", "+", "B", "+"))
    g.add_link(Link("A", "+", "T2", "+"))
    g.add_link(Link("B", "+", "T2", "+"))
    return g


def test_haploid_coverage_estimate():
    g = _diamond()
    hc = estimate_haploid_coverage(g)
    assert 19 <= hc <= 40  # simple contigs: A, B (1 nb/side) and T/T2


def test_determine_multiplicity_diamond():
    g = _diamond()
    mult = determine_multiplicity(g, haploid_coverage=20)
    assert mult["A"] == 1 and mult["B"] == 1
    assert mult["T"] == 2 and mult["T2"] == 2


def test_multiplicity_consistency_pass():
    g = _diamond()
    # trunk depth mis-measured low: the junction sum should still win
    g.depths["T"] = 22
    mult = determine_multiplicity(g, haploid_coverage=20)
    assert mult["T"] == 2
