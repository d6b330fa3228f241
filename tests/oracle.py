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


# ---------------------------------------------------------------------------
# ORF-projection oracle (KmerProcessor.annotateGenome transcription)
# ---------------------------------------------------------------------------

from kmers_anno_tpu.genome.dna import DnaTranslator
from kmers_anno_tpu.genome.locations import Location


def oracle_contig_kmers(genome, k: int, strict: bool = False):
    """KmerReference.getContigKmers + KmerFactory (KmerReference.java:
    157-203, KmerFactory.java:64-81): kmer text -> list of Locations."""
    xlator = DnaTranslator(genome.genetic_code)
    kmers = {}
    for contig in genome.contigs:
        seq_len = len(contig.sequence)
        for strand, seq in (("+", contig.sequence),
                            ("-", contig.r_sequence)):
            for frame in (1, 2, 3):
                prot = xlator.translate(seq, frame, len(seq))
                end = len(prot) - k
                for i in range(end):
                    km = prot[i: i + k]
                    if "*" in km or "X" in km:
                        continue
                    if strand == "+":
                        left = i * 3 + frame
                    else:
                        left = (seq_len - 3 * k + 2) - (i * 3 + frame)
                    kmers.setdefault(km, []).append(
                        Location(contig.id, strand, left, left + 3 * k - 1))
    if strict:
        kmers = {t: v for t, v in kmers.items() if len(v) == 1}
    return kmers


def oracle_peg_singletons(genome, k: int):
    """KmerReference.countPegKmers + getSingletons (Q5): kmer -> peg id."""
    counts = {}
    for feat in genome.pegs:
        prot = feat.protein_translation
        if not prot:
            continue
        end = len(prot) - k
        for i in range(end):
            km = prot[i: i + k]
            if "X" in km:
                continue
            if km not in counts:
                counts[km] = [feat.id, 0]
            counts[km][1] += 1
    return {km: fid for km, (fid, c) in counts.items() if c == 1}


def oracle_annotate(genome, close_genomes, k=8, min_strength=0.5,
                    max_fuzz=1.5, min_fuzz=0.8, min_evidence=10,
                    max_genomes=10, strict=False):
    """Direct transcription of KmerProcessor.annotateGenome
    (KmerProcessor.java:166-287): returns (proposals list in numbering
    order, stats dict).  Mutates nothing."""
    from kmers_anno_tpu.engine.proposals import PegProposalList

    real_strength = min_strength / 3
    proposals = PegProposalList(genome, real_strength, min_evidence)
    contig_kmers = oracle_contig_kmers(genome, k, strict)
    n_genomes = 0
    for cg in genome.close_genomes:
        if n_genomes >= max_genomes:
            break
        old = close_genomes.get(cg.genome_id)
        if old is None:
            continue
        n_genomes += 1
        peg_kmers = oracle_peg_singletons(old, k)
        # framer: [frame][pegId] -> sorted location list
        framer = {}
        for km, fid in peg_kmers.items():
            for loc in contig_kmers.get(km, ()):
                framer.setdefault((loc.frame, fid), []).append(loc)
        for (frame, fid), locs in framer.items():
            locs.sort(key=lambda l: (l.contig_id, l.left, l.right))
            peg = old.get_feature(fid)
            peg_len = peg.protein_length * 3
            max_len = int(peg_len * max_fuzz + 1)
            min_len = int(peg_len * min_fuzz)
            min_kmers = int(peg_len * real_strength)
            if min_kmers > len(locs):
                continue
            n = len(locs) - min_kmers
            for i in range(n + 1):
                first = locs[i]
                evidence = 1
                max_edge = first.left + max_len
                min_edge = first.left + min_len
                best_edge = first.right
                for loc in locs[i + 1:]:
                    if loc.contig_id != first.contig_id:
                        break
                    if loc.right < max_edge:
                        evidence += 1
                        best_edge = max(best_edge, loc.right)
                if best_edge < min_edge:
                    continue
                whole = Location(first.contig_id, first.strand,
                                 first.left, best_edge)
                proposals.propose(whole, peg.function, evidence)
    stats = dict(made=proposals.made, merged=proposals.merged,
                 rejected=proposals.rejected, weak=proposals.weak,
                 small=proposals.small, kept=proposals.count)
    return list(proposals), stats
