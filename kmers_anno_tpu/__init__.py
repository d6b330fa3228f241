"""kmers_anno_tpu — a TPU-native k-mer genome annotation engine.

A from-scratch JAX/XLA/Pallas re-implementation of the capabilities of SEEDtk
``kmers.anno`` (reference: /root/reference, Java).  The compute path encodes
sequences as packed integer tensors, runs k-mer extraction / hashing / table
probing / vote reduction as batched device kernels, and scales over a
``jax.sharding.Mesh`` with XLA collectives.  The host layer provides the GTO
genome model, coordinate math, role/function maps, file I/O and the CLI
surface of the reference tool.

Three annotation engines (mirroring SURVEY.md §1):

1. ORF-projection engine  (``kmers`` / ``batch`` commands)  — engine.projection
2. Discriminating-kmer engine (``build`` / ``apply``)        — engine.signature, engine.apply
3. Kmer-hash similarity engine (``hashAnno`` / ``applyAnno``)— engine.hashanno
"""

__version__ = "0.1.0"
