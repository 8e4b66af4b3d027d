"""Run several benchmark scripts sequentially in ONE process.

Why: the axon terminal holds a freed TPU grant for ~5-10 minutes after a
client process exits, so every separate TPU process pays that wait at
its first device sync (see .claude/skills/verify/SKILL.md gotchas).
Chaining scripts in one process claims the grant once.

Usage:
  python benchmarks/chain.py "bucketed_train_ab.py qm9 2048" \
                             "cond_flagship.py --n-iters 30000"

Each spec is shlex-split; a bare script name resolves relative to
benchmarks/. Failures are printed and the chain continues.
"""

from __future__ import annotations

import os
import runpy
import shlex
import sys
import time
import traceback


def main():
    base = os.path.dirname(os.path.abspath(__file__))
    specs = sys.argv[1:]
    for spec in specs:
        parts = shlex.split(spec)
        path = parts[0]
        if not os.path.isabs(path):
            path = os.path.join(base, path)
        sys.argv = [path] + parts[1:]
        t0 = time.time()
        print(f"=== chain start: {spec}", flush=True)
        try:
            runpy.run_path(path, run_name="__main__")
        except SystemExit as e:
            if e.code not in (0, None):
                print(f"=== chain: {spec} exited {e.code}", flush=True)
        except Exception:
            traceback.print_exc()
            print(f"=== chain: {spec} FAILED, continuing", flush=True)
        print(f"=== chain done: {spec} ({time.time() - t0:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
