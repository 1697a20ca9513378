#!/usr/bin/env python
"""Launch the live boids viewer (reference ``main.py``)."""

import sys

from spatialsim_tpu.apps.viewer import run_viewer


def main() -> int:
    count = int(sys.argv[1]) if len(sys.argv) > 1 else None
    return run_viewer("boids", count)


if __name__ == "__main__":
    sys.exit(main())
