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
