"""CLI command processors (the reference's L0/L1 layers, SURVEY.md §1).

Each subcommand is a Processor class with the reference lifecycle
``set_defaults → parse → validate_parms → run_command``
(BaseProcessor contract, App.java:81-82), implemented over argparse.
"""

from .base import BaseProcessor, ParseFailureException
from .app import main, COMMANDS

__all__ = ["BaseProcessor", "ParseFailureException", "main", "COMMANDS"]
