"""Host utilities: counters, tabular/FASTA I/O, CLI processor framework."""

from .counters import CountMap, QualityCountMap
from .io import (TabbedLineReader, LineReader, FastaReader, FastaWriter,
                 Sequence, read_set)

__all__ = [
    "CountMap", "QualityCountMap",
    "TabbedLineReader", "LineReader", "FastaReader", "FastaWriter",
    "Sequence", "read_set",
]
