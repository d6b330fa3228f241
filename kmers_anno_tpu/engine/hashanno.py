"""Kmer-hash similarity annotation engine (``hashAnno`` command,
HashAnnotationProcessor.java:63-330).

Implements the contract of the external ``GenomeProteinKmers``/``Prototype``
classes (SURVEY.md §2b) with a device-probed design:

* A genome's usable proteins (non-blank, no '*') are deduplicated by MD5
  and their DISTINCT kmers become a device CSR: unique kmer → list of
  protein indices, fronted by the bucketed probe table.
* Every protein starts with the **default proposal** (its old annotation at
  similarity 0.0) — this is why the reference's per-feature output can show
  score 0.0 = "defaulted" (Q12, HashAnnotationProcessor.java:297).
* Prototypes are scored in chunks: one device probe of all chunk kmers,
  host CSR expansion, and a vectorized per-(prototype, protein)
  common-kmer count.  Similarity is the Jaccard similarity of distinct
  kmer sets |∩| / |∪| — the SEED convention (``ProteinKmers.distance`` is
  the matching Jaccard distance, SURVEY.md §2b ProteinKmers row; the
  0.0125 default floor ≈ 1/80 of shared kmers).
* A proposal improves only on strictly greater similarity, and must meet
  the minScore floor; within a chunk, the earliest prototype wins ties —
  matching the reference's sequential first-wins processing order.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np

from functools import partial

import jax

from .. import native
from ..genome.gto import Genome, protein_md5
from ..ops.encode import PROT_PAD, encode_protein
from ..ops.hashtable import build_table, probe_table
from ..ops.kmers import pack_kmer_windows
from .apply_engine import _bucket
from .projection import _sort_with_payload

log = logging.getLogger(__name__)


@partial(jax.jit, static_argnames=("k",))
def _pack(codes, k: int):
    return pack_kmer_windows(codes, k)


@dataclass
class Prototype:
    """One row of the role annotation file (protein, annotation)."""

    protein: str
    annotation: str


def _distinct_kmers_flat(proteins: list[str], k: int):
    """Distinct kmers per protein over a flat stream.

    returns (lo, hi, owner) arrays — each protein's kmer set, deduplicated
    within the protein — plus per-protein distinct-kmer counts.
    Kmer extraction keeps ALL length-k windows (a pure kmer-set iterator:
    the external ProteinKmers contract, not the in-repo Q1/Q2 extractors).
    """
    n = len(proteins)
    if n == 0:
        z = np.zeros(0, np.uint32)
        return z, z, np.zeros(0, np.int32), np.zeros(0, np.int64)
    lengths = np.array([len(p) for p in proteins], np.int64)
    total = int(lengths.sum())
    width = _bucket(total, 4096)
    # ProteinKmers keeps ALL ln-k+1 windows (no Q1 drop, no ambiguity
    # filter) — same contract the build/apply engines use
    got = native.flat_batch(proteins, k, width, -1)
    if got is not None:  # C++ data loader (kan_host.cpp)
        codes, owner, valid = got
    else:
        codes = np.full(width, PROT_PAD, np.uint8)
        owner = np.full(width, -1, np.int32)
        valid = np.zeros(width, bool)
        pos = 0
        for i, p in enumerate(proteins):
            ln = len(p)
            codes[pos: pos + ln] = encode_protein(p)
            owner[pos: pos + ln] = i
            if ln >= k:
                valid[pos: pos + ln - k + 1] = True
            pos += ln
    d_lo, d_hi = _pack(jnp.asarray(codes), k)
    lo = np.asarray(d_lo)[valid]
    hi = np.asarray(d_hi)[valid]
    own = owner[valid]
    # dedup (kmer, owner) pairs
    u = np.unique(np.stack([hi, lo, own.astype(np.uint32)], axis=1), axis=0)
    lo_u, hi_u, own_u = u[:, 1], u[:, 0], u[:, 2].astype(np.int32)
    counts = np.bincount(own_u, minlength=n).astype(np.int64)
    return lo_u, hi_u, own_u, counts


class GenomeProteinKmers:
    """Per-genome kmer hash with best-proposal bookkeeping
    (GenomeProteinKmers contract, HashAnnotationProcessor.java:233-291)."""

    def __init__(self, k: int, min_score: float):
        self.k = k
        self.min_score = min_score
        self._fids: list[str] = []
        self._proteins: list[str] = []
        self._annotations: list[str] = []
        self._md5_of: dict[str, int] = {}
        self._built = False

    def add_protein(self, fid: str, prot: str, annotation: str) -> None:
        md5 = protein_md5(prot)
        if md5 in self._md5_of:
            return  # identical sequence already registered
        self._md5_of[md5] = len(self._proteins)
        self._fids.append(fid)
        self._proteins.append(prot)
        self._annotations.append(annotation)
        self._built = False

    # ----- index construction -----

    def _build(self) -> None:
        lo, hi, owner, counts = _distinct_kmers_flat(self._proteins, self.k)
        self.protein_kmer_counts = counts
        n = len(self._proteins)
        # defaults: old annotation at similarity 0.0
        self.best_sim = np.zeros(n, np.float64)
        self.best_anno = list(self._annotations)
        if len(lo):
            slo, shi, sown, first, seg, seg_counts = _sort_with_payload(
                jnp.asarray(lo), jnp.asarray(hi), jnp.asarray(owner))
            slo, shi = np.asarray(slo), np.asarray(shi)
            first = np.asarray(first)
            starts = np.flatnonzero(first)
            self.csr_owner = np.asarray(sown)
            self.csr_starts = starts.astype(np.int64)
            self.csr_counts = np.asarray(seg_counts)[: len(starts)].astype(
                np.int32)
            table, self.max_probes = build_table(
                slo[starts], shi[starts],
                np.arange(len(starts), dtype=np.uint32))
            self.table = jnp.asarray(table)
            self.kmer_count = len(starts)
        else:
            self.table = None
            self.kmer_count = 0
        self._built = True

    @property
    def n_kmers(self) -> int:
        if not self._built:
            self._build()
        return self.kmer_count

    # ----- prototype scoring -----

    def process_proposals(self, prototypes: list[Prototype],
                          chunk: int = 4096) -> int:
        """Score every prototype; returns total match count (proteins whose
        proposal a prototype improved)."""
        if not self._built:
            self._build()
        matches = 0
        for start in range(0, len(prototypes), chunk):
            matches += self._process_chunk(prototypes[start: start + chunk])
        return matches

    def _process_chunk(self, protos: list[Prototype]) -> int:
        if self.table is None or not protos:
            return 0
        lo, hi, owner, n2 = _distinct_kmers_flat(
            [p.protein for p in protos], self.k)
        if not len(lo):
            return 0
        ranks = np.asarray(probe_table(
            self.table, jnp.asarray(lo), jnp.asarray(hi),
            jnp.ones(len(lo), bool), self.max_probes))
        hit = ranks >= 0
        ranks, proto_of = ranks[hit], owner[hit]
        if not len(ranks):
            return 0
        counts = self.csr_counts[ranks]
        starts = self.csr_starts[ranks]
        total = int(counts.sum())
        offs = np.arange(total) - np.repeat(np.cumsum(counts) - counts,
                                            counts)
        prot_idx = self.csr_owner[np.repeat(starts, counts) + offs]
        pair_proto = np.repeat(proto_of, counts)
        # common-kmer count per (prototype, protein) pair
        n_prot = len(self._proteins)
        pair_key = pair_proto.astype(np.int64) * n_prot + prot_idx
        uniq_keys, common = np.unique(pair_key, return_counts=True)
        u_proto = (uniq_keys // n_prot).astype(np.int64)
        u_prot = (uniq_keys % n_prot).astype(np.int64)
        n1 = self.protein_kmer_counts[u_prot]
        union = n1 + n2[u_proto] - common
        sim = np.where(union > 0, common / np.maximum(union, 1), 0.0)
        ok = sim >= self.min_score
        u_proto, u_prot, sim = u_proto[ok], u_prot[ok], sim[ok]
        if not len(sim):
            return 0
        # earliest prototype wins ties within the chunk: stable order by
        # (protein, -sim, proto) and take the first row per protein
        order = np.lexsort((u_proto, -sim, u_prot))
        u_prot_o = u_prot[order]
        first = np.ones(len(order), bool)
        first[1:] = u_prot_o[1:] != u_prot_o[:-1]
        rows = order[first]
        improved = 0
        for r in rows:
            p = int(u_prot[r])
            if sim[r] > self.best_sim[p]:
                self.best_sim[p] = sim[r]
                self.best_anno[p] = protos[int(u_proto[r])].annotation
                improved += 1
        return improved

    # ----- lookup -----

    def get_proposal(self, md5: str):
        """(similarity, annotation) for a protein MD5, or None."""
        idx = self._md5_of.get(md5)
        if idx is None:
            return None
        if not self._built:
            self._build()
        return float(self.best_sim[idx]), self.best_anno[idx]


OUTPUT_HEADER = "fid\tscore\tnew_annotation\told_annotation"


def annotate_genome_rows(genome: Genome, prototypes: list[Prototype],
                         k: int, min_score: float):
    """Full hashAnno pass over one genome.

    returns (rows — one (fid, score_str, new, old) per feature in order,
             change_rows subset, stats dict).
    """
    gk = GenomeProteinKmers(k, min_score)
    f_count = s_count = p_count = 0
    for feat in genome.features:
        prot = feat.protein_translation
        f_count += 1
        if not prot or "*" in prot:
            s_count += 1
        else:
            p_count += 1
            gk.add_protein(feat.id, prot, feat.peg_function)
    log.info("%d features processed, %d skipped, %d proteins, %d kmers "
             "in %s.", f_count, s_count, p_count, gk.n_kmers, genome)
    matches = gk.process_proposals(prototypes)
    rows = []
    changes = []
    d_count = c_count = 0
    for feat in genome.features:
        old = feat.peg_function
        prot = feat.protein_translation
        md5 = protein_md5(prot) if prot else ""
        proposal = gk.get_proposal(md5) if md5 else None
        if proposal is None:
            rows.append((feat.id, "", old, old))
        else:
            score, new = proposal
            score_str = repr(score) if score else "0.0"
            row = (feat.id, score_str, new, old)
            rows.append(row)
            if score == 0.0:
                d_count += 1
            elif old == new:
                c_count += 1
            else:
                changes.append(row)
    stats = dict(features=f_count, skipped=s_count, proteins=p_count,
                 matches=matches, defaulted=d_count, confirmed=c_count,
                 changed=len(changes))
    return rows, changes, stats
