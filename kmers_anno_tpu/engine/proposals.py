"""Peg proposals and the per-ORF proposal list (PegProposal.java:15-165,
PegProposalList.java:20-142).

Semantics preserved exactly (SURVEY.md §2c Q7):

* a proposal's identity is (contig, end, strand) — one proposal per ORF;
* ``create`` extends the location to a start/stop codon via
  ``Location.extend``, returning None when impossible;
* strength = evidence / extended length; filters run in the order
  invalid → weak (strength < min) → small (evidence < minEvidence);
* a duplicate ORF keeps the better proposal (more evidence, tie → longer)
  by merging: function/begin/evidence overwrite the stored proposal;
* iteration order is (contig, left edge, length) — the peg numbering order
  (PegProposal.compareTo, PegProposal.java:85-99).
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Iterator

from ..genome.locations import Location

if TYPE_CHECKING:  # pragma: no cover
    from ..genome.gto import Genome


class PegProposal:
    """A proposed peg: extended location + function + evidence."""

    __slots__ = ("loc", "function", "evidence")

    def __init__(self, loc: Location, function: str, evidence: int):
        self.loc = loc
        self.function = function
        self.evidence = evidence

    @staticmethod
    def create(genome: "Genome", loc: Location, function: str,
               evidence: int) -> "PegProposal | None":
        real = loc.extend(genome)
        if real is None:
            return None
        return PegProposal(real, function, evidence)

    @property
    def strength(self) -> float:
        return self.evidence / self.loc.length

    def better_than(self, other: "PegProposal") -> bool:
        if self.evidence > other.evidence:
            return True
        return (self.evidence == other.evidence
                and self.loc.length > other.loc.length)

    def merge(self, other: "PegProposal") -> None:
        """Overwrite with the better proposal's data; the ORF end stays."""
        self.function = other.function
        self.loc.set_begin(other.loc.begin)
        self.evidence = other.evidence

    def orf_key(self) -> tuple:
        return (self.loc.contig_id, self.loc.end, self.loc.strand)

    def sort_key(self) -> tuple:
        return (self.loc.contig_id, self.loc.left, self.loc.length)

    def __repr__(self) -> str:
        return (f"PegProposal({self.loc}, {self.function!r}, "
                f"evidence={self.evidence})")


class PegProposalList:
    """One proposal per ORF, strongest wins; iterates in numbering order."""

    def __init__(self, genome: "Genome", min_strength: float,
                 min_evidence: int):
        self.genome = genome
        self.min_strength = min_strength
        self.min_evidence = min_evidence
        self.made = 0
        self.rejected = 0
        self.weak = 0
        self.small = 0
        self.merged = 0
        self._by_orf: dict[tuple, PegProposal] = {}
        self._extender = None

    def propose(self, loc: Location, function: str,
                evidence: int) -> PegProposal | None:
        self.made += 1
        # O(1) precomputed-scan extension (ops.orf); identical semantics to
        # PegProposal.create's per-codon walk, ~20x faster at 40k calls/genome
        if self._extender is None:
            from ..ops.orf import OrfExtender
            self._extender = OrfExtender(self.genome)
        ext = self._extender.extend(loc)
        if ext is None:
            self.rejected += 1
            return None
        new = PegProposal(Location(loc.contig_id, loc.strand, *ext),
                          function, evidence)
        if new.strength < self.min_strength:
            self.weak += 1
            return None
        if evidence < self.min_evidence:
            self.small += 1
            return None
        key = new.orf_key()
        old = self._by_orf.get(key)
        if old is None:
            self._by_orf[key] = new
            return new
        if new.better_than(old):
            old.merge(new)
            self.merged += 1
            return old
        return None

    @property
    def count(self) -> int:
        return len(self._by_orf)

    def __iter__(self) -> Iterator[PegProposal]:
        return iter(sorted(self._by_orf.values(),
                           key=PegProposal.sort_key))
