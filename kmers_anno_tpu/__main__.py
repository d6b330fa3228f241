"""``python -m kmers_anno_tpu <command> ...`` — the App.main equivalent."""

import sys

from .commands.app import main

if __name__ == "__main__":
    sys.exit(main())
