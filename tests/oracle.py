"""Single-threaded pure-Python oracle of the reference semantics.

A direct transcription of the Java algorithms (HashMap-centric, sequential)
used as the golden reference for the device engines.  Deliberately naive —
correctness only.

* build: BuildKmerProcessor.java:137-223 two-pass semantics
* apply: ApplyKmerProcessor.java:122-147 unanimous-vote loop (Q9)
* ProteinKmers: all L-K+1 substrings (the documented contract assumption,
  SURVEY.md §2b ProteinKmers row)
"""

from __future__ import annotations


def protein_kmers(protein: str, k: int) -> list[str]:
    return [protein[i: i + k] for i in range(len(protein) - k + 1)]


class RoleCounter:
    """RoleCounter.java:14-79: good iff every count used the same role."""

    def __init__(self, role_id: str):
        self.role_id = role_id
        self.good = 0
        self.bad = 0

    def count(self, role_id: str) -> bool:
        if role_id == self.role_id:
            self.good += 1
            return True
        self.bad += 1
        return False

    def is_good(self) -> bool:
        return self.bad == 0


def oracle_build(genomes, role_map, good_roles: set[str], k: int = 8
                 ) -> dict[str, str]:
    """kmer text → role id, per the two-pass build semantics."""
    kmer_map: dict[str, RoleCounter] = {}
    buffered: list[str] = []
    for genome in genomes:
        for peg in genome.pegs:
            prot = peg.protein_translation
            if not prot:
                continue
            peg_roles = [r for r in peg.get_useful_roles(role_map)
                         if r.id in good_roles]
            if not peg_roles:
                buffered.append(prot)
            elif len(peg_roles) == 1:
                rid = peg_roles[0].id
                for kmer in protein_kmers(prot, k):
                    counter = kmer_map.get(kmer)
                    if counter is None:
                        counter = kmer_map[kmer] = RoleCounter(rid)
                    counter.count(rid)
    # prune non-unanimous kmers
    kmer_map = {km: c for km, c in kmer_map.items() if c.is_good()}
    # pass 2: kill kmers found in uninteresting proteins
    for prot in buffered:
        for kmer in protein_kmers(prot, k):
            kmer_map.pop(kmer, None)
    return {km: c.role_id for km, c in kmer_map.items()}


def oracle_apply_protein(kmer_db: dict[str, str], protein: str, k: int,
                         min_hits: int) -> tuple[str, int] | None:
    """The sequential unanimous-vote loop, ApplyKmerProcessor.java:122-147."""
    role_id = None
    count = 0
    for kmer in protein_kmers(protein, k):
        possible = kmer_db.get(kmer)
        if possible is not None:
            if role_id is None:
                role_id = possible
                count = 1
            elif possible == role_id:
                count += 1
            else:
                return None  # badPeg
    if role_id is not None and count >= min_hits:
        return role_id, count
    return None
