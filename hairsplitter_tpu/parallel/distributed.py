"""Multi-host distributed pipeline (jax.distributed over a pod slice).

The reference is strictly single-node shared-memory: an OpenMP `parallel for`
over contigs with one critical-section reduction for the global error rate
(`src/call_variants.cpp:1276-1371,1310-1316`) and no distributed backend of
any kind. This module introduces the missing layer from scratch:

  stage 2 (mapping)      — READ data parallelism: every process maps its
                           slice of the read set against the full minimizer
                           index, so each read still competes against every
                           contig exactly as in a single-process run;
                           alignments are then exchanged so each process
                           holds those of its own contig shard.
  stages 3-4 (variants / — CONTIG data parallelism (the reference's OpenMP
  separation)              axis): contigs are greedily size-balanced across
                           processes; the global error rate is an all-reduce
                           of (mismatch, cell) sums — the distributed form
                           of the reference's omp-critical accumulation.
  stages 5-6 (new contigs— gathered to process 0: graph surgery and
  / untangling)            untangling are pointer-chasing host work on data
                           that has already been reduced by orders of
                           magnitude.

Every exchange uses `multihost_utils.process_allgather` (ICI/DCN
collectives), so the result on process 0 is bit-identical to a
single-process `run_pipeline` on the same inputs (tests/test_distributed.py).

Launch (one command per host / process):
  python -m hairsplitter_tpu.parallel.distributed \
      --coordinator HOST:PORT --num-processes N --process-id I \
      -i assembly.gfa -f reads.fa -o outdir
"""

from __future__ import annotations

import argparse
import os
import pickle
from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class DistConfig:
    coordinator: str = ""  # "host:port"; empty = auto-detect (TPU pod)
    num_processes: int = 1
    process_id: int = 0
    # CPU-backend emulation: devices per process (0 = leave platform alone)
    cpu_devices_per_process: int = 0


def init_runtime(dist: DistConfig) -> None:
    """Initialise jax.distributed BEFORE any backend use."""
    import jax

    if dist.cpu_devices_per_process:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", dist.cpu_devices_per_process)
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    if dist.num_processes > 1:
        kwargs = {}
        if dist.coordinator:
            kwargs = dict(
                coordinator_address=dist.coordinator,
                num_processes=dist.num_processes,
                process_id=dist.process_id,
            )
        jax.distributed.initialize(**kwargs)


def shard_items(sizes: dict[str, int], num_processes: int, process_id: int) -> list[str]:
    """Deterministic size-balanced partition (greedy largest-first)."""
    loads = [0] * num_processes
    owner: dict[str, int] = {}
    for name in sorted(sizes, key=lambda n: (-sizes[n], n)):
        p = int(np.argmin(loads))
        loads[p] += sizes[name]
        owner[name] = p
    return [n for n, p in owner.items() if p == process_id]


def allreduce_sum(values: np.ndarray) -> np.ndarray:
    """Sum a small fixed-shape float array across all processes."""
    from jax.experimental import multihost_utils

    g = multihost_utils.process_allgather(np.asarray(values, np.float64))
    return np.asarray(g).sum(axis=0)


def allgather_blobs(blob: bytes) -> list[bytes]:
    """All-gather variable-length byte strings (pad to max, then cut)."""
    from jax.experimental import multihost_utils

    n = np.asarray([len(blob)], np.int32)
    lens = np.asarray(multihost_utils.process_allgather(n)).ravel()
    m = int(lens.max())
    buf = np.zeros(m, np.uint8)
    if blob:
        buf[: len(blob)] = np.frombuffer(blob, np.uint8)
    allbuf = np.asarray(multihost_utils.process_allgather(buf))
    return [allbuf[i, : lens[i]].tobytes() for i in range(len(lens))]


def exchange(per_dest: list[object]) -> list[object]:
    """All-to-all of picklable payloads: per_dest[p] goes to process p;
    returns the list of payloads addressed to this process (by sender)."""
    import jax

    me = jax.process_index()
    blobs = allgather_blobs(pickle.dumps(per_dest))
    return [pickle.loads(b)[me] for b in blobs]


def run_pipeline_distributed(
    assembly_path: str,
    reads_path: str,
    out_dir: str,
    cfg=None,
    dist: DistConfig = DistConfig(),
):
    """Distributed variant of `pipeline.orchestrate.run_pipeline`.

    Every process parses the inputs (replicated host I/O); reads are sharded
    for mapping, contigs for variant calling/separation, and process 0 runs
    the final graph stages and writes the outputs. Returns the final GFA path
    on process 0, None elsewhere.
    """
    import jax

    from ..core.mapping import map_reads
    from ..core.seeding import MinimizerIndex
    from ..constants import encode_seq
    from ..io.fasta import ReadStore, read_fasta, write_fasta
    from ..io.gfa import cut_assembly, fasta_to_gfa, gfa_to_fasta, parse_gfa, write_gfa
    from .. import pipeline as _pl  # noqa: F401  (package import for subs below)
    from ..pipeline.call_variants import call_variants_from_prep, prepare_contig
    from ..pipeline.new_contigs import create_new_contigs, write_gaf
    from ..pipeline.orchestrate import Logger, PipelineConfig
    from ..pipeline.separate_reads import separate_reads_for_contig
    from ..pipeline.unzip import unzip

    cfg = cfg or PipelineConfig()
    me = jax.process_index()
    nproc = jax.process_count()
    os.makedirs(out_dir, exist_ok=True)
    log = Logger(os.path.join(out_dir, f"hairsplitter.p{me}.log"))
    log.log(f"distributed run: process {me}/{nproc}, {jax.device_count()} global devices")

    # ---- stages 0-1: replicated input parse + chunking ----------------------
    if assembly_path.endswith((".fa", ".fasta", ".fa.gz", ".fasta.gz")):
        assembly = fasta_to_gfa(read_fasta(assembly_path))
    else:
        assembly = parse_gfa(assembly_path)
    for name, seq in list(assembly.segments.items()):
        up = seq.upper()
        if any(c not in "ACGT" for c in up):
            assembly.segments[name] = "".join(c if c in "ACGT" else "A" for c in up)
        elif up != seq:
            assembly.segments[name] = up
    assembly = cut_assembly(assembly, cfg.max_contig_chunk)
    my_contigs = shard_items(
        {n: len(s) for n, s in assembly.segments.items()}, nproc, me
    )
    owner_of = {}
    for p in range(nproc):
        for n in shard_items({n: len(s) for n, s in assembly.segments.items()}, nproc, p):
            owner_of[n] = p
    log.log(f"  {len(assembly.segments)} contigs; this process owns {len(my_contigs)}")

    # ---- stage 2: read-sharded mapping against the FULL index ---------------
    store = ReadStore(reads_path)
    read_seqs = {i: store.get_seq(i) for i in range(len(store))}
    my_reads = list(range(me, len(store), nproc))
    contig_codes = {n: encode_seq(s) for n, s in assembly.segments.items()}
    index = MinimizerIndex.build(contig_codes, k=cfg.map.k, w=cfg.map.w, max_occ=cfg.map.max_occ)
    alns = map_reads(
        assembly.segments,
        [read_seqs[i] for i in my_reads],
        cfg.map,
        read_indices=my_reads,
        index=index,
    )
    log.log(f"  mapped {len(my_reads)} reads -> {len(alns)} alignments")
    # route alignments to their contig's owner
    per_dest: list[list] = [[] for _ in range(nproc)]
    for a in alns:
        per_dest[owner_of[a.contig]].append(a)
    received = exchange(per_dest)
    per_contig_alns: dict[str, list] = {c: [] for c in my_contigs}
    for batch in received:
        for a in batch:
            per_contig_alns[a.contig].append(a)
    # deterministic order regardless of process count
    for c in per_contig_alns:
        per_contig_alns[c].sort(key=lambda a: (a.read_idx, a.t_start, a.q_start))

    # ---- stage 3: contig-sharded variant calling, global error rate ---------
    vcfg = cfg.variants
    vcfg.auto_frac = cfg.auto_frac
    preps = {
        c: prepare_contig(c, assembly.segments[c], per_contig_alns[c], read_seqs, vcfg)
        for c in my_contigs
    }
    local = np.asarray(
        [sum(p.mismatches for p in preps.values()), sum(p.cells for p in preps.values())],
        np.float64,
    )
    tot_mm, tot_cells = allreduce_sum(local)  # the reference's omp-critical sum
    error_rate = min(tot_mm / max(1.0, tot_cells), vcfg.error_cap)
    log.log(f"  global error rate {error_rate:.4f}")
    variants = {c: call_variants_from_prep(preps[c], error_rate, vcfg) for c in my_contigs}

    # ---- stage 4: contig-sharded read separation ----------------------------
    scfg = cfg.separate
    scfg.amplicon = cfg.technology == "amplicon"
    scfg.rarest_strain_abundance = cfg.rarest_strain_abundance
    groups = {}
    for c in my_contigs:
        spans = [(a.t_start, a.t_end) for a in per_contig_alns[c]]
        groups[c] = separate_reads_for_contig(variants[c], spans, scfg)
    n_sep = sum(
        1
        for g in groups.values()
        for w in g.windows
        if len(set(w.labels[w.labels >= 0].tolist())) > 1
    )
    log.log(f"  {n_sep} windows with >1 haplotype (local shard)")

    # ---- gather to process 0 for the graph stages ---------------------------
    payload = pickle.dumps({c: (per_contig_alns[c], groups[c]) for c in my_contigs})
    gathered = allgather_blobs(payload)
    if me != 0:
        log.log("  shard work done; process 0 finishes the graph stages")
        return None

    zip_in = {}
    for b in gathered:
        zip_in.update(pickle.loads(b))
    zip_in = {c: zip_in[c] for c in assembly.segments}  # canonical order
    zr = create_new_contigs(assembly, zip_in, read_seqs, cfg.polish_everything)
    log.log(f"  {len(zr.graph.segments)} new contigs")
    tmp_dir = os.path.join(out_dir, "tmp")
    os.makedirs(tmp_dir, exist_ok=True)
    write_gfa(zr.graph, os.path.join(tmp_dir, "zipped_assembly.gfa"))
    write_gaf(
        os.path.join(tmp_dir, "reads_on_new_contig.gaf"),
        zr.read_paths,
        {i: store.names[i] for i in range(len(store))},
    )
    if cfg.dont_simplify:
        final_graph = zr.graph
    else:
        final_graph = unzip(zr.graph, zr.read_paths).graph
        log.log(f"  {len(final_graph.segments)} contigs after untangling")
    final_gfa = os.path.join(out_dir, "hairsplitter_final_assembly.gfa")
    write_gfa(final_graph, final_gfa)
    write_fasta(
        os.path.join(out_dir, "hairsplitter_final_assembly.fasta"),
        gfa_to_fasta(final_graph),
    )
    log.log(f"done: {final_gfa}")
    return final_gfa


def main(argv=None):
    ap = argparse.ArgumentParser(description="distributed hairsplitter_tpu")
    ap.add_argument("--coordinator", default="", help="host:port of process 0")
    ap.add_argument("--num-processes", type=int, default=1)
    ap.add_argument("--process-id", type=int, default=0)
    ap.add_argument("--cpu-devices", type=int, default=0, help="CPU emulation: devices/process")
    ap.add_argument("-i", dest="assembly", required=True)
    ap.add_argument("-f", dest="reads", required=True)
    ap.add_argument("-o", dest="out", required=True)
    args = ap.parse_args(argv)
    dist = DistConfig(args.coordinator, args.num_processes, args.process_id, args.cpu_devices)
    init_runtime(dist)
    run_pipeline_distributed(args.assembly, args.reads, args.out, dist=dist)


if __name__ == "__main__":
    main()
