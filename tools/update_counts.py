"""Regenerate the test/LoC counts quoted in README.md and COVERAGE.md
so docs can't drift from the tree (VERDICT r02 item 10).

Usage: python tools/update_counts.py [--check]
  --check: exit 1 if any doc count is stale (used by the test suite).
"""

from __future__ import annotations

import glob
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_count() -> int:
    n = 0
    for p in glob.glob(os.path.join(REPO, "tests", "test_*.py")):
        n += len(re.findall(r"^def test_", open(p).read(), re.M))
    return n


def source_loc() -> int:
    n = 0
    for dirpath, _, files in os.walk(os.path.join(REPO, "menelaus_spark")):
        for fn in files:
            if fn.endswith(".py"):
                n += sum(1 for _ in open(os.path.join(dirpath, fn)))
    return n


def main() -> int:
    check = "--check" in sys.argv
    nt, loc = test_count(), source_loc()
    subs = [
        (os.path.join(REPO, "README.md"),
         r"(Tests: `python -m pytest tests/ -x -q` \()\d+(\))",
         rf"\g<1>{nt}\g<2>"),
        (os.path.join(REPO, "COVERAGE.md"),
         r"(\| `python -m pytest -x -q` green \| )\d+( tests \|)",
         rf"\g<1>{nt}\g<2>"),
    ]
    stale = 0
    for path, pat, repl in subs:
        src = open(path).read()
        new, n = re.subn(pat, repl, src)
        if n == 0:
            print(f"WARNING: pattern not found in {os.path.basename(path)}")
            continue
        if new != src:
            stale += 1
            if check:
                print(f"STALE: {os.path.basename(path)} (expected {nt} tests)")
            else:
                open(path, "w").write(new)
                print(f"updated {os.path.basename(path)} -> {nt} tests")
    print(f"tests={nt} source_loc={loc}")
    return 1 if (check and stale) else 0


if __name__ == "__main__":
    sys.exit(main())
