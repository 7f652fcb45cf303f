#!/usr/bin/env python
"""Regenerate README's test counts from pytest's own collection.

The counts drifted in rounds 3 and 4 (tests were added after the README
line was written); this makes the refresh mechanical:

  python scripts/refresh_counts.py          # rewrite README.md in place
  python scripts/refresh_counts.py --check  # exit 1 when stale
"""

from __future__ import annotations

import argparse
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def collected(extra_args) -> int:
    out = subprocess.run(
        [sys.executable, "-m", "pytest", "--collect-only", "-q", *extra_args],
        cwd=REPO, capture_output=True, text=True)
    m = re.search(r"(\d+)(?:/\d+)? tests? collected", out.stdout)
    if not m:
        raise SystemExit(f"cannot parse pytest collection:\n{out.stdout[-800:]}")
    return int(m.group(1))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--check", action="store_true")
    args = p.parse_args()

    total = collected(["tests/"])
    smoke = collected(["-m", "smoke", "tests/"])
    path = os.path.join(REPO, "README.md")
    text = open(path, encoding="utf-8").read()
    new = re.sub(r"fast contract tier \(\d+ tests",
                 f"fast contract tier ({smoke} tests", text)
    new = re.sub(r"The full suite \(\d+ tests\)",
                 f"The full suite ({total} tests)", new)
    if args.check:
        if new != text:
            print(f"README counts stale (now {total} total / {smoke} smoke)")
            return 1
        print(f"README counts current ({total} total / {smoke} smoke)")
        return 0
    if new != text:
        open(path, "w", encoding="utf-8").write(new)
        print(f"README refreshed: {total} total / {smoke} smoke")
    else:
        print(f"README already current: {total} total / {smoke} smoke")
    return 0


if __name__ == "__main__":
    sys.exit(main())
