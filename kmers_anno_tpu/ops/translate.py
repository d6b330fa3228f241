"""Vectorized genetic-code translation (device).

The reference translates contig strands frame by frame through a per-codon
string loop (KmerReference.java:180-203 via DnaTranslator).  Here a whole
strand is translated for *all* codon start positions in one shot: a 65-entry
LUT gather over ``c0*16 + c1*4 + c2`` (NCBI base order), with ambiguous
codons mapping to 'X'.  Frame f's protein is then the stride-3 slice
``aa[f::3]`` — no per-codon host work at all.

LUTs are generated from genome.dna.GeneticCode so host and device
translation can never disagree.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..genome.dna import GeneticCode
from .encode import encode_protein

_LUT_CACHE: dict[int, np.ndarray] = {}


def codon_lut(gc: int) -> np.ndarray:
    """65-entry uint8 LUT in *protein-code* space (index 64 = ambiguous)."""
    if gc not in _LUT_CACHE:
        ascii_lut = GeneticCode.get(gc).aa_lut()
        _LUT_CACHE[gc] = encode_protein(ascii_lut.tobytes().decode("ascii"))
    return _LUT_CACHE[gc]


def sliding_translate(dna_codes: jnp.ndarray, lut: jnp.ndarray) -> jnp.ndarray:
    """Translate every codon start position of a DNA code array.

    dna_codes: (N,) uint8 (0..3 = t,c,a,g; >=4 ambiguous/pad)
    returns:   (N-2,) uint8 protein codes; position i is the amino acid of
               the codon starting at 0-based position i.
    """
    c0 = dna_codes[:-2].astype(jnp.int32)
    c1 = dna_codes[1:-1].astype(jnp.int32)
    c2 = dna_codes[2:].astype(jnp.int32)
    valid = (c0 < 4) & (c1 < 4) & (c2 < 4)
    idx = jnp.where(valid, c0 * 16 + c1 * 4 + c2, 64)
    return lut[idx]


def frame_protein(aa_sliding: jnp.ndarray, frame: int) -> jnp.ndarray:
    """Protein of reading frame ``frame`` (0-based) from a sliding
    translation: the stride-3 slice starting at ``frame``."""
    return aa_sliding[frame::3]
