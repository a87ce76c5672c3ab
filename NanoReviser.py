#!/usr/bin/env python
"""Drop-in entry point matching the reference's ``python NanoReviser.py ...``."""

import sys

from nanoreviser_tpu.cli.reviser import main

if __name__ == "__main__":
    sys.exit(main())
