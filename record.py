#!/usr/bin/env python
"""Root shim for the recorder (reference ``record.py``)."""

import sys

from spatialsim_tpu.tools.record import main

if __name__ == "__main__":
    sys.exit(main())
