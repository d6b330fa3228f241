"""hashAnno engine vs dict-based oracle + the anno command family."""

import copy
import math
import os
import random

import pytest

from kmers_anno_tpu.engine.hashanno import (GenomeProteinKmers, Prototype,
                                            annotate_genome_rows)
from kmers_anno_tpu.genome.gto import protein_md5

from fixtures import make_genome, random_protein

K = 8
MIN_SCORE = 0.0125


def kmer_set(prot, k=K):
    return {prot[i: i + k] for i in range(len(prot) - k + 1)}


def oracle_hashanno(proteins, prototypes, k=K, min_score=MIN_SCORE):
    """Sequential best-proposal scoring: first prototype wins ties."""
    sets = [kmer_set(p, k) for p in proteins]
    best = [(0.0, None)] * len(proteins)
    for proto, anno in prototypes:
        pset = kmer_set(proto, k)
        for i, s in enumerate(sets):
            common = len(s & pset)
            if not common:
                continue
            union = len(s) + len(pset) - common
            sim = common / union
            if sim >= min_score and sim > best[i][0]:
                best[i] = (sim, anno)
    return best


@pytest.fixture(scope="module")
def genome():
    return make_genome("500.1", seed=77, n_per_role=4)


def test_engine_matches_oracle(genome):
    rng = random.Random(5)
    pegs = [f for f in genome.pegs if f.protein_translation
            and "*" not in f.protein_translation]
    # prototypes: exact copies, fragments, mutants, and noise
    prototypes = []
    for i, f in enumerate(pegs[:8]):
        p = f.protein_translation
        prototypes.append((p, f"exact anno {i}"))
        prototypes.append((p[5: 5 + max(K + 4, len(p) // 2)],
                           f"fragment anno {i}"))
        mutated = list(p)
        for _ in range(3):
            mutated[rng.randrange(len(mutated))] = rng.choice("ACDEFGHIK")
        prototypes.append(("".join(mutated), f"mutant anno {i}"))
    prototypes.append((random_protein(rng, 80), "noise anno"))
    # dedup by md5 like the engine does
    seen, uniq_prots = set(), []
    for f in pegs:
        md5 = protein_md5(f.protein_translation)
        if md5 not in seen:
            seen.add(md5)
            uniq_prots.append(f.protein_translation)
    want = oracle_hashanno(uniq_prots, prototypes)

    gk = GenomeProteinKmers(K, MIN_SCORE)
    for f in pegs:
        gk.add_protein(f.id, f.protein_translation, f.peg_function)
    gk.process_proposals(prototypes=[Prototype(p, a)
                                     for p, a in prototypes], chunk=5)
    for i, prot in enumerate(uniq_prots):
        sim, anno = gk.get_proposal(protein_md5(prot))
        wsim, wanno = want[i]
        assert math.isclose(sim, wsim, rel_tol=1e-12), (i, sim, wsim)
        if wanno is not None:
            assert anno == wanno, (i, anno, wanno)


def test_annotate_rows_classification(genome):
    pegs = [f for f in genome.pegs if f.protein_translation]
    protos = [Prototype(pegs[0].protein_translation,
                        pegs[0].peg_function),          # confirm peg 0
              Prototype(pegs[1].protein_translation,
                        "Completely new function")]     # change peg 1
    rows, changes, stats = annotate_genome_rows(genome, protos, K,
                                                MIN_SCORE)
    assert len(rows) == len(genome.features)
    by_fid = {r[0]: r for r in rows}
    r0 = by_fid[pegs[0].id]
    assert r0[2] == pegs[0].peg_function and float(r0[1]) > 0.9
    r1 = by_fid[pegs[1].id]
    assert r1[2] == "Completely new function"
    assert (pegs[1].id, r1[1], r1[2], r1[3]) in changes
    # proteins missed by every prototype default to score 0.0
    assert stats["defaulted"] > 0
    defaulted = [r for r in rows if r[1] == "0.0"]
    assert all(r[2] == r[3] for r in defaulted)
    assert stats["confirmed"] >= 1 and stats["changed"] >= 1


def test_cli_hash_anno_apply_check_list(genome, tmp_path):
    from kmers_anno_tpu.commands.app import main

    gto_dir = tmp_path / "gtos"
    gto_dir.mkdir()
    g = copy.deepcopy(genome)
    g.save(str(gto_dir / f"{g.id}.gto"))
    pegs = [f for f in g.pegs if f.protein_translation]
    anno_file = str(tmp_path / "annos.tbl")
    with open(anno_file, "w") as fh:
        fh.write("protein\tannotation\n")
        fh.write(f"{pegs[0].protein_translation}\t{pegs[0].peg_function}\n")
        fh.write(f"{pegs[1].protein_translation}\tShiny new function\n")
    out_dir = str(tmp_path / "Annotations")

    rc = main(["hashAnno", "-K", str(K), "-D", out_dir, "--minLen", "10",
               anno_file, str(gto_dir)])
    assert rc == 0
    anno_out = os.path.join(out_dir, f"{g.id}.anno.tbl")
    assert os.path.isfile(anno_out)
    lines = open(anno_out).read().splitlines()
    assert lines[0] == "fid\tscore\tnew_annotation\told_annotation"
    assert len(lines) == len(g.features) + 1
    changes = open(os.path.join(out_dir, "changes.tbl")).read().splitlines()
    assert any("Shiny new function" in ln for ln in changes[1:])

    # --missing resume: nothing left to process, files untouched
    before = open(anno_out).read()
    rc = main(["hashAnno", "-K", str(K), "-D", out_dir, "--minLen", "10",
               "--missing", anno_file, str(gto_dir)])
    assert rc == 0 and open(anno_out).read() == before

    # applyAnno: the changed annotation lands in the output genome
    out_gtos = str(tmp_path / "out_gtos")
    rc = main(["applyAnno", out_dir, str(gto_dir), out_gtos])
    assert rc == 0
    from kmers_anno_tpu.genome.gto import Genome
    updated = Genome.load(os.path.join(out_gtos, f"{g.id}.gto"))
    assert updated.get_feature(pegs[1].id).function == "Shiny new function"

    # checkAnno: report parses with one genome row + TOTALS
    report = str(tmp_path / "check.tbl")
    rc = main(["checkAnno", "-o", report, out_dir])
    assert rc == 0
    rlines = open(report).read().splitlines()
    assert rlines[0].startswith("genome\tfids\tdefaulted")
    assert len(rlines) == 3 and rlines[2].startswith("TOTALS")
    fields = rlines[1].split("\t")
    assert fields[0] == g.id and int(fields[1]) == len(g.features)

    # listAnno FULL + NEW_ROLES between original and updated genomes
    full = str(tmp_path / "full.tbl")
    rc = main(["listAnno", "-o", full, str(gto_dir), out_gtos])
    assert rc == 0
    flines = open(full).read().splitlines()
    assert flines[0].split("\t")[0] == "fid"
    assert len(flines) == len(g.features) + 1
    new_roles = str(tmp_path / "new_roles.tbl")
    rc = main(["listAnno", "--format", "NEW_ROLES", "-o", new_roles,
               str(gto_dir), out_gtos])
    assert rc == 0
    nlines = open(new_roles).read().splitlines()
    # only hypothetical→changed rows qualify
    assert all("hypothetical protein" in ln for ln in nlines[1:])


def test_owner_cap_overflow_matches_uncapped(genome, monkeypatch):
    """A kmer shared by MORE proteins than OWNER_CAP must still count every
    owner: overflow owners ride the host CSR path (ADVICE r2 — a duplicated
    transposase family would otherwise blow up the dense owner matrix)."""
    import kmers_anno_tpu.engine.hashanno as ha

    rng = random.Random(9)
    shared = random_protein(rng, 30)     # one family core > any tiny cap
    # 12 proteins all containing the shared core plus unique flanks
    prots = [(f"fig|1.1.peg.{i}",
              random_protein(rng, 10) + shared + random_protein(rng, 10),
              f"old {i}") for i in range(12)]
    protos = [Prototype(shared, "family anno"),
              Prototype(prots[3][1], "exact anno")]

    def run():
        gk = GenomeProteinKmers(K, MIN_SCORE)
        for fid, p, old in prots:
            gk.add_protein(fid, p, old)
        gk.process_proposals(protos)
        return [gk.get_proposal(protein_md5(p)) for _, p, _ in prots]

    want = run()                          # default cap (32 ≥ 12: no CSR)
    monkeypatch.setattr(ha, "OWNER_CAP", 2)
    got = run()                           # every shared kmer overflows
    assert got == want
    assert all(sim > 0 for sim, _ in got)   # comparison is not vacuous


def test_batched_matches_per_genome():
    """annotate_genomes_batched == per-genome annotate_genome_rows,
    including shared sequences with DIFFERENT old annotations (the
    per-genome default map)."""
    from kmers_anno_tpu.engine.hashanno import (PrototypeSet,
                                                annotate_genomes_batched)

    rng = random.Random(11)
    g1 = make_genome("700.1", seed=91, n_per_role=3)
    g2 = make_genome("700.2", seed=92, n_per_role=3)
    g3 = make_genome("700.3", seed=93, n_per_role=2)
    # plant one shared protein in all three genomes with different old
    # annotations (exercises the per-genome 0.0-score default)
    shared = random_protein(rng, 120)
    for i, g in enumerate((g1, g2, g3)):
        feat = copy.deepcopy(g.features[0])
        feat.raw["id"] = f"fig|{g.id}.peg.9999"
        feat.function = f"distinct old annotation {i}"
        feat.raw["protein_translation"] = shared
        g.features.append(feat)
    genomes = [g1, g2, g3]

    prototypes = [Prototype(f.protein_translation, f"proto {i}")
                  for i, f in enumerate(g1.pegs[:5])]
    prototypes.append(Prototype(random_protein(rng, 90), "noise proto"))
    protoset = PrototypeSet(prototypes, K)

    want = [annotate_genome_rows(g, protoset, K, MIN_SCORE)
            for g in genomes]
    got = annotate_genomes_batched(genomes, protoset, K, MIN_SCORE)
    for (wrows, wchanges, wstats), (grows, gchanges, gstats) in zip(want,
                                                                    got):
        assert grows == wrows
        assert gchanges == wchanges
        for key in ("features", "skipped", "proteins", "defaulted",
                    "confirmed", "changed"):
            assert gstats[key] == wstats[key]


def test_rate_logger(caplog):
    from kmers_anno_tpu.engine.hashanno import RateLogger

    rl = RateLogger("lines", interval=0.0)
    with caplog.at_level("INFO", logger="kmers_anno_tpu.engine.hashanno"):
        rl.add(100)
        rl.add(50)
    assert any("lines/second" in r.getMessage() for r in caplog.records)
    assert rl.n == 150


def test_cli_hash_anno_data_parallel_identical(tmp_path):
    """hashAnno --data-parallel on the 8-virtual-device mesh writes the
    same per-genome anno.tbl files and change-row set as the sequential
    run (the parallelStream analogue, SURVEY §2d DP)."""
    import jax

    from kmers_anno_tpu.commands.app import main

    assert len(jax.devices()) >= 3
    gto_dir = tmp_path / "gtos"
    gto_dir.mkdir()
    genomes = [make_genome(f"80{i}.1", seed=60 + i, n_per_role=2)
               for i in range(6)]
    for g in genomes:
        g.save(str(gto_dir / f"{g.id}.gto"))
    pegs = [f for f in genomes[0].pegs if f.protein_translation]
    anno_file = str(tmp_path / "annos.tbl")
    with open(anno_file, "w") as fh:
        fh.write("protein\tannotation\n")
        fh.write(f"{pegs[0].protein_translation}\t"
                 f"{pegs[0].peg_function}\n")
        fh.write(f"{pegs[1].protein_translation}\tShiny new function\n")

    out_seq = str(tmp_path / "seq")
    rc = main(["hashAnno", "-K", str(K), "-D", out_seq, "--minLen", "10",
               "--batch", "2", anno_file, str(gto_dir)])
    assert rc == 0
    out_par = str(tmp_path / "par")
    rc = main(["hashAnno", "-K", str(K), "-D", out_par, "--minLen", "10",
               "--batch", "2", "--data-parallel", "3",
               anno_file, str(gto_dir)])
    assert rc == 0
    for g in genomes:
        a = open(os.path.join(out_seq, f"{g.id}.anno.tbl")).read()
        b = open(os.path.join(out_par, f"{g.id}.anno.tbl")).read()
        assert a == b
    ch_seq = sorted(
        open(os.path.join(out_seq, "changes.tbl")).read().splitlines()[1:])
    ch_par = sorted(
        open(os.path.join(out_par, "changes.tbl")).read().splitlines()[1:])
    assert ch_seq == ch_par
