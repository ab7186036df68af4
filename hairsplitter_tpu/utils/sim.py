"""Long-read / haplotype simulator for tests and benchmarks.

The reference ships no runnable test reads (`test/simple_mock/mock_reads.fasta`
is absent from the repo; README.md:68-70) — its GraphUnzip evaluation harness
sketches the approach we productize here: generate random haplotypes that
differ by SNPs, sample error-prone reads from them, and check phasing against
the known truth (`src/GraphUnzip/tests.py:384-438,477-527`).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..constants import decode_seq, encode_seq, revcomp

_BASES = "ACGT"


def random_genome(length: int, rng: np.random.Generator) -> str:
    return "".join(rng.choice(list(_BASES), size=length))


def mutate(seq: str, snp_rate: float, rng: np.random.Generator) -> tuple[str, list[int]]:
    """Introduce substitutions at ~snp_rate; returns (mutated, positions)."""
    codes = encode_seq(seq).copy()
    n = max(1, int(len(seq) * snp_rate))
    pos = np.sort(rng.choice(len(seq), size=n, replace=False))
    for p in pos:
        codes[p] = (codes[p] + rng.integers(1, 4)) % 4
    return decode_seq(codes), pos.tolist()


def make_haplotypes(
    length: int,
    n_haplotypes: int,
    divergence: float,
    rng: np.random.Generator,
) -> list[str]:
    """A shared backbone plus n haplotypes each mutated at ~divergence."""
    backbone = random_genome(length, rng)
    return [mutate(backbone, divergence, rng)[0] for _ in range(n_haplotypes)]


@dataclass
class SimReads:
    names: list[str]
    seqs: list[str]
    hap_of_read: list[int]  # truth labels
    starts: list[int]
    strands: list[int]


def simulate_reads(
    haplotypes: list[str],
    coverage: float,
    read_len: int,
    rng: np.random.Generator,
    sub_rate: float = 0.0,
    ins_rate: float = 0.0,
    del_rate: float = 0.0,
    len_sd: float = 0.0,
    circular: bool = False,
) -> SimReads:
    """Sample reads uniformly from the haplotypes with a simple error model."""
    names, seqs, haps, starts, strands = [], [], [], [], []
    ridx = 0
    for h, hap in enumerate(haplotypes):
        n_reads = int(np.ceil(coverage * len(hap) / read_len))
        for _ in range(n_reads):
            L = max(50, int(rng.normal(read_len, len_sd))) if len_sd else read_len
            if circular:
                s = int(rng.integers(0, len(hap)))
                frag = (hap + hap)[s : s + L]
            else:
                s = int(rng.integers(0, max(1, len(hap) - L + 1)))
                frag = hap[s : s + L]
            frag = _apply_errors(frag, sub_rate, ins_rate, del_rate, rng)
            strand = int(rng.integers(0, 2))
            if strand == 0:
                frag = revcomp(frag)
            names.append(f"read_{ridx}_h{h}")
            seqs.append(frag)
            haps.append(h)
            starts.append(s)
            strands.append(strand)
            ridx += 1
    return SimReads(names, seqs, haps, starts, strands)


def _apply_errors(seq: str, sub: float, ins: float, dele: float, rng) -> str:
    if sub == 0 and ins == 0 and dele == 0:
        return seq
    out = []
    for ch in seq:
        r = rng.random()
        if r < dele:
            continue
        if r < dele + ins:
            out.append(ch)
            out.append(_BASES[rng.integers(0, 4)])
            continue
        if r < dele + ins + sub:
            out.append(_BASES[(_BASES.index(ch) + rng.integers(1, 4)) % 4] if ch in _BASES else ch)
        else:
            out.append(ch)
    return "".join(out)


def write_sim_fasta(path: str, sim: SimReads) -> None:
    with open(path, "w") as f:
        for name, seq in zip(sim.names, sim.seqs):
            f.write(f">{name}\n{seq}\n")
