"""Host-side genome domain model: GTO JSON, locations, DNA translation, roles.

Implements the contracts of the reference's unmounted ``org.theseed`` domain
libraries (SURVEY.md §2b) as plain Python over NumPy, designed so sequences
round-trip losslessly to the packed integer arrays used by the device ops.
"""

from .dna import DnaTranslator, GeneticCode, reverse_complement
from .locations import Location, Frame, SortedLocationList
from .gto import Genome, Feature, Contig, CloseGenome, SubsystemRow
from .roles import Role, RoleMap, Function, FunctionMap

__all__ = [
    "DnaTranslator", "GeneticCode", "reverse_complement",
    "Location", "Frame", "SortedLocationList",
    "Genome", "Feature", "Contig", "CloseGenome", "SubsystemRow",
    "Role", "RoleMap", "Function", "FunctionMap",
]
