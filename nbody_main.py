#!/usr/bin/env python
"""Launch the live N-body viewer (reference ``nbody_main.py``)."""

import argparse
import sys

from spatialsim_tpu.apps.viewer import run_viewer
from spatialsim_tpu.presets import parse_number


def main() -> int:
    p = argparse.ArgumentParser(description="Live N-body viewer")
    p.add_argument("--bodies", type=str, default=None,
                   help="body count (k/m suffixes ok)")
    args = p.parse_args()
    count = parse_number(args.bodies) if args.bodies else None
    return run_viewer("nbody", count)


if __name__ == "__main__":
    sys.exit(main())
