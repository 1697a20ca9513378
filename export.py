#!/usr/bin/env python
"""Root shim for video export."""

import sys

from spatialsim_tpu.tools.export import main

if __name__ == "__main__":
    sys.exit(main())
