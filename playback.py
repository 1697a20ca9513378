#!/usr/bin/env python
"""Root shim for playback (reference ``playback.py``)."""

import sys

from spatialsim_tpu.tools.playback import main

if __name__ == "__main__":
    sys.exit(main())
