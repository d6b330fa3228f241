"""Genome sources and targets (GenomeSource / GenomeTargetType contracts,
SURVEY.md §2b: enum-typed sources with ``type.create(dir)``, ``getIDs()``,
``getGenome(id)``; targets accept genomes).

The PATRIC/BV-BRC source (P3Genome.load — KmerProcessor.java:189) is
cache-first: genomes are looked up as ``<cache>/<id>.gto`` before any
network attempt, and downloaded GTOs are written back to the cache.  In a
network-isolated deployment the cache is the only backing store; fetch
failures warn and return None exactly like the reference's not-found path
(KmerProcessor.java:190-191).
"""

from __future__ import annotations

import json
import logging
import os
from typing import Iterator

from .gto import Genome

log = logging.getLogger(__name__)

PATRIC_GENOME_URL = ("https://p3.theseed.org/services/data_api/genome/")


class GenomeSource:
    """Base genome source."""

    TYPES: dict[str, type] = {}

    @classmethod
    def create(cls, type_name: str, path: str) -> "GenomeSource":
        try:
            return cls.TYPES[type_name.upper()](path)
        except KeyError:
            raise ValueError(f"unknown genome source type {type_name!r}")

    def ids(self) -> list[str]:
        raise NotImplementedError

    def get(self, genome_id: str) -> Genome | None:
        raise NotImplementedError

    def __len__(self) -> int:
        return len(self.ids())

    def __iter__(self) -> Iterator[Genome]:
        for gid in self.ids():
            g = self.get(gid)
            if g is not None:
                yield g


class DirGenomeSource(GenomeSource):
    """A directory of ``<genomeId>.gto`` files."""

    def __init__(self, path: str):
        if not os.path.isdir(path):
            raise FileNotFoundError(f"genome directory {path} not found")
        self.path = path

    def ids(self) -> list[str]:
        return sorted(f[:-4] for f in os.listdir(self.path)
                      if f.endswith(".gto"))

    def get(self, genome_id: str) -> Genome | None:
        p = os.path.join(self.path, genome_id + ".gto")
        return Genome.load(p) if os.path.isfile(p) else None


class PatricGenomeSource(GenomeSource):
    """BV-BRC genomes with a local GTO cache (P3Genome.load contract).

    ``path`` is the cache directory; IDs are whatever the cache holds.
    ``get`` consults the cache first, then attempts a network fetch (which
    in an isolated environment fails fast and returns None with a warning).
    """

    def __init__(self, path: str | None):
        self.cache = path
        if path is not None and not os.path.isdir(path):
            raise FileNotFoundError(f"genome cache {path} is not a directory")

    def ids(self) -> list[str]:
        if self.cache is None:
            return []
        return sorted(f[:-4] for f in os.listdir(self.cache)
                      if f.endswith(".gto"))

    def get(self, genome_id: str) -> Genome | None:
        if self.cache is not None:
            p = os.path.join(self.cache, genome_id + ".gto")
            if os.path.isfile(p):
                return Genome.load(p)
        genome = self._fetch(genome_id)
        if genome is not None and self.cache is not None:
            genome.save(os.path.join(self.cache, genome_id + ".gto"))
        return genome

    def _fetch(self, genome_id: str) -> Genome | None:
        """Network fetch of a GTO from BV-BRC; None on any failure."""
        import urllib.error
        import urllib.request
        url = PATRIC_GENOME_URL + genome_id
        try:
            with urllib.request.urlopen(url, timeout=30) as resp:
                return Genome(json.load(resp))
        except Exception as exc:  # isolated envs fail here by design
            log.warning("Could not fetch genome %s: %s", genome_id, exc)
            return None


GenomeSource.TYPES.update(DIR=DirGenomeSource, PATRIC=PatricGenomeSource)


class DirGenomeTarget:
    """Writes genomes as ``<id>.gto`` files (IGenomeTarget DIR contract)."""

    def __init__(self, path: str, clear: bool = False):
        os.makedirs(path, exist_ok=True)
        if clear:
            for name in os.listdir(path):
                if name.endswith(".gto"):
                    os.unlink(os.path.join(path, name))
        self.path = path

    def add(self, genome: Genome) -> None:
        genome.save(os.path.join(self.path, genome.id + ".gto"))
