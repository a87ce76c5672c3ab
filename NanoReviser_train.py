#!/usr/bin/env python
"""Drop-in entry point matching the reference's ``python NanoReviser_train.py ...``."""

import sys

from nanoreviser_tpu.cli.train import main

if __name__ == "__main__":
    sys.exit(main())
