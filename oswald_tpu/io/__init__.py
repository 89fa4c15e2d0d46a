from oswald_tpu.io.fasta import parse_fasta, write_fasta
from oswald_tpu.io.db import (
    PackedDB, pack_sequences, preprocess_db, load_db, load_queries,
    GROUP_LANES, SUBLANES, LANES, LENGTH_QUANTUM,
)
from oswald_tpu.io.stream import preprocess_db_streaming

__all__ = [
    "parse_fasta", "write_fasta",
    "PackedDB", "pack_sequences", "preprocess_db", "load_db", "load_queries",
    "preprocess_db_streaming",
    "GROUP_LANES", "SUBLANES", "LANES", "LENGTH_QUANTUM",
]
