"""Monkeypatch-timed projection profile (stages inside annotate_genome)."""
import time
import numpy as np


def main():
    rng = np.random.default_rng(seed=7)
    import kmers_anno_tpu.engine.projection as P
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

    t = {}

    def timed(name, fn):
        def wrap(*a, **k):
            t0 = time.perf_counter()
            out = fn(*a, **k)
            t[name] = t.get(name, 0.0) + time.perf_counter() - t0
            return out
        return wrap

    # fine-grained inner timers
    import kmers_anno_tpu.ops.contig_kmers as CK
    CK_extract = CK.extract_contig_kmers
    P.extract_contig_kmers = timed("  extract_contig", CK_extract)
    import kmers_anno_tpu.ops.hashtable as HT
    P.build_table = timed("  build_table", HT.build_table)
    from kmers_anno_tpu import native
    native_groupby = native.groupby
    native.groupby = timed("  native_groupby", native_groupby)

    P.ContigKmerIndex.build = classmethod(
        timed("index_build", P.ContigKmerIndex.build.__func__))

    P.peg_singleton_kmers = timed("singletons", P.peg_singleton_kmers)
    orig_project = P.ProjectionAnnotator._project_from
    P.ProjectionAnnotator._project_from = timed("project_from", orig_project)
    orig_probe = P.probe_table
    P.probe_table = timed("  probe_in_project", orig_probe)

    annot = P.ProjectionAnnotator(k=8)
    annot.annotate_genome(new_genome(), olds.get)   # warm/compile
    t.clear()
    t0 = time.perf_counter()
    annot.annotate_genome(new_genome(), olds.get)
    total = time.perf_counter() - t0
    for k, v in t.items():
        print(f"{k:20s} {v*1000:9.1f} ms  {100*v/total:5.1f}%")
    print(f"{'TOTAL':20s} {total*1000:9.1f} ms")


if __name__ == "__main__":
    main()
