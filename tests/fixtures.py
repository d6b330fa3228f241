"""Synthetic GTO fixture generation for engine tests.

The reference test fixture (small.gto) has no roles.to.use companion, so the
engine tests generate deterministic genomes with known role structure:
proteins are random AA strings seeded per (genome, peg), with controlled
sharing so every build-semantics branch (sole-role, multi-role, kill-list,
conflicting kmers) is exercised.
"""

from __future__ import annotations

import random

from kmers_anno_tpu.genome.gto import Genome
from kmers_anno_tpu.genome.roles import Role, RoleMap, role_checksum

AA = "ACDEFGHIKLMNPQRSTVWY"

ROLE_DEFS = [
    ("PhenTrnaSyntAlph", "Phenylalanyl-tRNA synthetase alpha chain"),
    ("LsuRiboProtL2", "LSU ribosomal protein L2p"),
    ("DnaPolyIii", "DNA polymerase III alpha subunit"),
    ("SeryTrnaSynt", "Seryl-tRNA synthetase"),
    ("HypoProt", "hypothetical protein x-type"),
]


def random_protein(rng: random.Random, length: int) -> str:
    return "".join(rng.choice(AA) for _ in range(length))


def make_role_map() -> RoleMap:
    rm = RoleMap()
    for rid, name in ROLE_DEFS:
        rm.put(Role(rid, name))
    return rm


def write_role_files(tmpdir) -> tuple[str, str]:
    """Write roles.in.subsystems + roles.to.use; returns their paths.
    roles.to.use lists the first 4 roles (HypoProt is uninteresting)."""
    role_file = str(tmpdir / "roles.in.subsystems")
    with open(role_file, "w") as fh:
        for rid, name in ROLE_DEFS:
            fh.write(f"{rid}\t{role_checksum(name)}\t{name}\n")
    use_file = str(tmpdir / "roles.to.use")
    with open(use_file, "w") as fh:
        for rid, _ in ROLE_DEFS[:4]:
            fh.write(rid + "\n")
    return role_file, use_file


def make_genome(genome_id: str, seed: int, n_per_role: int = 3,
                shared_protein: str | None = None) -> Genome:
    """A synthetic genome with n_per_role pegs per role plus uninteresting
    and multi-role pegs.  ``shared_protein`` (if given) is added under TWO
    different roles so its kmers are non-unanimous across pegs."""
    rng = random.Random(seed)
    features = []
    n = 0

    def add_peg(function: str, protein: str):
        nonlocal n
        n += 1
        features.append({
            "id": f"fig|{genome_id}.peg.{n}",
            "type": "CDS",
            "function": function,
            "location": [["con1", str(100 * n), "+", 90]],
            "protein_translation": protein,
            "annotations": [],
            "aliases": [],
        })

    first_role_protein = None
    for rid, name in ROLE_DEFS[:4]:
        for _ in range(n_per_role):
            prot = random_protein(rng, rng.randint(40, 120))
            if first_role_protein is None:
                first_role_protein = prot
            add_peg(name, prot)
    # uninteresting pegs (kill list): functions not in roles.to.use
    for _ in range(4):
        add_peg(ROLE_DEFS[4][1], random_protein(rng, rng.randint(40, 120)))
    # a kill-list protein sharing kmers with an interesting one, so pass 2
    # (BuildKmerProcessor.java:196-208) has something to delete
    add_peg(ROLE_DEFS[4][1],
            random_protein(rng, 20) + first_role_protein[5:25]
            + random_protein(rng, 20))
    add_peg("totally unknown widget", random_protein(rng, 60))
    # a multi-role function (ignored by build: 2 interesting roles)
    add_peg(f"{ROLE_DEFS[0][1]} / {ROLE_DEFS[1][1]}",
            random_protein(rng, 80))
    if shared_protein is not None:
        add_peg(ROLE_DEFS[0][1], shared_protein)
        add_peg(ROLE_DEFS[1][1], shared_protein)
    return Genome({
        "id": genome_id,
        "scientific_name": f"Testus syntheticus {genome_id}",
        "genetic_code": 11,
        "domain": "Bacteria",
        "features": features,
        "contigs": [{"id": "con1", "dna": "acgt" * 2500,
                     "genetic_code": 11}],
        "close_genomes": [],
        "subsystems": [],
    })


# ---------------------------------------------------------------------------
# ORF-projection fixtures: a new genome with real ORFs + a close genome
# whose pegs are the ORF translations
# ---------------------------------------------------------------------------

CODONS = [a + b + c for a in "acgt" for b in "acgt" for c in "acgt"]
STOPS = {"taa", "tag", "tga"}
BODY_CODONS = [c for c in CODONS if c not in STOPS]


def random_gene(rng: random.Random, n_codons: int) -> str:
    """atg + random non-stop body + taa."""
    body = "".join(rng.choice(BODY_CODONS) for _ in range(n_codons))
    return "atg" + body + "taa"


def random_spacer(rng: random.Random, n: int) -> str:
    """Intergenic DNA with stop codons in every frame so ORF extension
    terminates quickly."""
    return "".join(rng.choice(["taa", "tag", "tga", "ta", "t"])
                   for _ in range(n))


def make_projection_pair(seed: int = 42, n_genes: int = 8,
                         old_id: str = "300.1", new_id: str = "400.1"):
    """(new_genome, {old_id: old_genome}) for projection tests.

    The new genome's contig carries n_genes ORFs (half on the minus
    strand); the old genome has one peg per ORF with a distinct function.
    """
    from kmers_anno_tpu.genome.dna import DnaTranslator, reverse_complement

    rng = random.Random(seed)
    xl = DnaTranslator(11)
    parts = [random_spacer(rng, 20)]
    genes = []
    for i in range(n_genes):
        gene = random_gene(rng, rng.randint(60, 140))
        strand = "+" if i % 2 == 0 else "-"
        start = sum(len(p) for p in parts) + 1  # 1-based left of gene
        placed = gene if strand == "+" else reverse_complement(gene)
        parts.append(placed)
        genes.append((gene, strand, start, start + len(gene) - 1))
        parts.append(random_spacer(rng, rng.randint(15, 30)))
    dna = "".join(parts)

    old_features = []
    for i, (gene, strand, left, right) in enumerate(genes):
        prot = xl.peg_translate(gene, 1, len(gene) - 3)
        old_features.append({
            "id": f"fig|{old_id}.peg.{i + 1}",
            "type": "CDS",
            "function": f"Projected role number {i + 1}",
            "location": [["oldcon", str(100 * i + 1), "+",
                          len(gene)]],
            "protein_translation": prot,
            "annotations": [], "aliases": [],
        })
    old_genome = Genome({
        "id": old_id, "scientific_name": "Oldus referencius",
        "genetic_code": 11, "domain": "Bacteria",
        "features": old_features,
        "contigs": [{"id": "oldcon", "dna": "acgt" * 100,
                     "genetic_code": 11}],
        "close_genomes": [], "subsystems": [],
    })
    new_genome = Genome({
        "id": new_id, "scientific_name": "Novus targetius",
        "genetic_code": 11, "domain": "Bacteria",
        "features": [],
        "contigs": [{"id": "newcon", "dna": dna, "genetic_code": 11}],
        "close_genomes": [{"genome": old_id,
                           "genome_name": "Oldus referencius",
                           "closeness_measure": 99.9}],
        "subsystems": [],
    })
    return new_genome, {old_id: old_genome}
