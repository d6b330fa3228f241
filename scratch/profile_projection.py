"""Stage-timed projection profile on the bench.py synthetic genome.

Prints per-stage wall times for annotate_genome so we can see where the
3.6 s/genome goes: index build / per-close-genome (singletons, probe,
CSR+scan, propose) / feature emission.
"""
import time
import numpy as np


def main():
    rng = np.random.default_rng(seed=7)
    from kmers_anno_tpu.engine import projection as P
    from kmers_anno_tpu.engine.projection import (ContigKmerIndex,
                                                  ProjectionAnnotator,
                                                  peg_singleton_kmers)
    from kmers_anno_tpu.ops.hashtable import probe_table
    import jax.numpy as jnp

    # rebuild the same synthetic workload bench_projection uses
    from kmers_anno_tpu.genome.dna import DnaTranslator, reverse_complement
    from kmers_anno_tpu.genome.gto import Genome

    xl = DnaTranslator(11)
    n_genes = 700
    parts = ["".join("acgt"[c] for c in rng.integers(0, 4, 50))]
    genes = []
    for i in range(n_genes):
        n_cod = int(rng.integers(60, 500))
        body = "".join("tcag"[c] for c in rng.integers(0, 4, 3 * n_cod))
        codons = [body[j: j + 3] for j in range(0, len(body), 3)]
        codons = [c for c in codons if c not in ("taa", "tag", "tga")]
        gene = "atg" + "".join(codons) + "taa"
        strand = "+" if i % 2 == 0 else "-"
        parts.append(gene if strand == "+" else reverse_complement(gene))
        parts.append("".join("acgt"[c] for c in rng.integers(0, 4, 30)))
        genes.append(gene)
    dna = "".join(parts)

    def old_genome(gid):
        feats = []
        for i, gene in enumerate(genes):
            prot = xl.peg_translate(gene, 1, len(gene) - 3)
            feats.append({
                "id": f"fig|{gid}.peg.{i + 1}", "type": "CDS",
                "function": f"Projected role number {i + 1}",
                "location": [["oc", str(1000 * i + 1), "+", len(gene)]],
                "protein_translation": prot,
                "annotations": [], "aliases": []})
        return Genome({
            "id": gid, "scientific_name": "Oldus", "genetic_code": 11,
            "domain": "Bacteria", "features": feats,
            "contigs": [{"id": "oc", "dna": "acgt" * 50}],
            "close_genomes": [], "subsystems": []})

    olds = {f"30{i}.1": old_genome(f"30{i}.1") for i in range(3)}

    def new_genome():
        return Genome({
            "id": "400.1", "scientific_name": "Novus",
            "genetic_code": 11, "domain": "Bacteria", "features": [],
            "contigs": [{"id": "nc", "dna": dna, "genetic_code": 11}],
            "close_genomes": [
                {"genome": gid, "genome_name": "Oldus",
                 "closeness_measure": 99.0} for gid in olds],
            "subsystems": []})

    annot = ProjectionAnnotator(k=8)
    annot.annotate_genome(new_genome(), olds.get)   # warm/compile

    # --- timed stages, run twice (2nd is the honest warm number) ---
    for rep in range(2):
        g = new_genome()
        t = {}
        t0 = time.perf_counter()
        index = ContigKmerIndex.build(g, 8, strict=False)
        t["index_build"] = time.perf_counter() - t0

        from kmers_anno_tpu.engine.proposals import PegProposalList
        proposals = PegProposalList(g, annot.min_strength / 3,
                                    annot.min_evidence)
        t["singletons"] = t["probe"] = t["scan_propose"] = 0.0
        for gid, og in olds.items():
            t1 = time.perf_counter()
            lo, hi, peg_idx, pegs = peg_singleton_kmers(og, 8)
            t["singletons"] += time.perf_counter() - t1
            t1 = time.perf_counter()
            ranks = np.asarray(probe_table(
                index.table, jnp.asarray(lo), jnp.asarray(hi),
                jnp.ones(len(lo), bool), index.max_probes))
            t["probe"] += time.perf_counter() - t1
            t1 = time.perf_counter()
            annot._project_from(og, index, proposals)
            t["scan_propose"] += time.perf_counter() - t1

        t1 = time.perf_counter()
        xlt = DnaTranslator(g.genetic_code)
        n = 0
        for prop in proposals:
            n += 1
            annot._make_feature(prop, g, n, xlt)
        t["make_features"] = time.perf_counter() - t1
        total = sum(t.values())
        if rep == 1:
            for k, v in t.items():
                print(f"{k:16s} {v*1000:9.1f} ms  {100*v/total:5.1f}%")
            print(f"{'TOTAL':16s} {total*1000:9.1f} ms  (probe counted "
                  "inside scan_propose too; 'probe' is the extra call)")


if __name__ == "__main__":
    main()
