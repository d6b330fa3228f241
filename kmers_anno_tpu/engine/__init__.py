"""Annotation engines (device compute + host orchestration).

Three engines, mirroring the reference (SURVEY.md §1):

* signature — discriminating-kmer table build (``build`` command,
  BuildKmerProcessor.java:137-223) as a device sort-based group-by.
* apply_engine — signature-table annotation (``apply`` command,
  ApplyKmerProcessor.java:113-155) as pack → hash-probe → segmented
  unanimous vote over a flat token stream.
* projection — close-genome ORF projection (``kmers``/``batch``,
  KmerProcessor.java:166-287).
* hashanno — kmer-hash similarity re-annotation (``hashAnno``,
  HashAnnotationProcessor.java:180-328).
"""

from .signature import SignatureTable, build_signatures
from .apply_engine import KmerApplyEngine

__all__ = ["SignatureTable", "build_signatures", "KmerApplyEngine"]
