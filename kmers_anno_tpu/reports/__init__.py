"""Report writers (contracts of the reference's reports package,
SURVEY.md §2a reporter rows)."""

from .apply_reports import (ApplyKmerReporter, DefaultApplyKmerReporter,
                            VerifyApplyKmerReporter)
from .annotation_reports import (AnnotationReporter,
                                 FullCompareAnnotationReporter,
                                 NewRoleAnnotationReporter)

__all__ = [
    "ApplyKmerReporter", "DefaultApplyKmerReporter",
    "VerifyApplyKmerReporter",
    "AnnotationReporter", "FullCompareAnnotationReporter",
    "NewRoleAnnotationReporter",
]
