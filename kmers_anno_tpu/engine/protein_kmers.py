"""Protein kmer sets with Jaccard distance (the external ``ProteinKmers``
contract, SURVEY.md §2b: iterable kmer set, global kmer size, ``distance``
in [0,1] with 0 ≡ identical — the SEED Jaccard-distance convention
1 − |∩|/|∪|)."""

from __future__ import annotations


class ProteinKmers:
    """Kmer set of one protein (all L−K+1 windows, no filtering)."""

    def __init__(self, protein: str, k: int = 8):
        self.protein = protein or ""
        self.k = k
        self.kmers = {self.protein[i: i + k]
                      for i in range(len(self.protein) - k + 1)}

    def __iter__(self):
        return iter(self.kmers)

    def __len__(self) -> int:
        return len(self.kmers)

    def distance(self, other: "ProteinKmers") -> float:
        """Jaccard distance: 1 − |∩| / |∪|; 1.0 when either set is empty."""
        if not self.kmers or not other.kmers:
            return 1.0
        common = len(self.kmers & other.kmers)
        union = len(self.kmers) + len(other.kmers) - common
        return 1.0 - common / union
