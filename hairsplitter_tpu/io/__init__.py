from .fasta import ReadStore, read_fasta, write_fasta
from .gfa import AssemblyGraph, Link, parse_gfa, write_gfa, fasta_to_gfa, gfa_to_fasta, cut_assembly
from .cigar import (
    parse_cigar,
    cigar_to_string,
    expand_cigar,
    compress_cigar,
    cigar_query_len,
    cigar_target_len,
)

__all__ = [
    "ReadStore", "read_fasta", "write_fasta",
    "AssemblyGraph", "Link", "parse_gfa", "write_gfa", "fasta_to_gfa",
    "gfa_to_fasta", "cut_assembly",
    "parse_cigar", "cigar_to_string", "expand_cigar", "compress_cigar",
    "cigar_query_len", "cigar_target_len",
]
