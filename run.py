#!/usr/bin/env python
"""Hot-reload development runner.

Re-implementation of the reference's dev supervisors (``run.py`` /
``run_nbody.py``): watches source files by mtime, restarts the target app
subprocess on change (with debounce), and force-restarts on ``r`` +
Enter.  One parameterized runner replaces the reference's duplicated pair.

Usage:
    python run.py                # watch + run the boids viewer
    python run.py nbody          # watch + run the N-body viewer
    python run.py nbody --debounce 3
"""

from __future__ import annotations

import argparse
import glob
import os
import select
import subprocess
import sys
import time

WATCH_PATTERNS = ["spatialsim_tpu/**/*.py", "*.py"]


def snapshot():
    files = {}
    for pattern in WATCH_PATTERNS:
        for path in glob.glob(pattern, recursive=True):
            try:
                files[path] = os.path.getmtime(path)
            except OSError:
                pass
    return files


def main() -> int:
    p = argparse.ArgumentParser(description="Hot-reload dev runner")
    p.add_argument("app", nargs="?", default="boids",
                   choices=["boids", "nbody"])
    p.add_argument("--debounce", type=float, default=None,
                   help="seconds to wait after a change (default: 10 boids,"
                        " 3 nbody, as in the reference)")
    args = p.parse_args()

    target = ["python", "main.py"] if args.app == "boids" \
        else ["python", "nbody_main.py"]
    debounce = args.debounce if args.debounce is not None \
        else (10.0 if args.app == "boids" else 3.0)

    print(f"[Run] Watching for changes (debounce {debounce:.0f}s); "
          "'r'+Enter forces a reload, Ctrl-C quits")
    proc = subprocess.Popen(target)
    files = snapshot()
    pending_since = None
    try:
        while True:
            time.sleep(0.5)
            if proc.poll() is not None:
                print(f"[Run] App exited ({proc.returncode}); waiting for "
                      "a change to restart")
            # Keyboard force-reload (non-blocking stdin poll).
            if sys.stdin in select.select([sys.stdin], [], [], 0)[0]:
                if sys.stdin.readline().strip().lower() == "r":
                    pending_since = time.time() - debounce
            current = snapshot()
            if current != files:
                files = current
                pending_since = time.time()
                print("[Run] Change detected; reloading after debounce...")
            if pending_since is not None \
                    and time.time() - pending_since >= debounce:
                pending_since = None
                if proc.poll() is None:
                    proc.terminate()
                    proc.wait(timeout=10)
                print("[Run] Restarting app")
                proc = subprocess.Popen(target)
    except KeyboardInterrupt:
        if proc.poll() is None:
            proc.terminate()
        print("\n[Run] Bye")
    return 0


if __name__ == "__main__":
    sys.exit(main())
