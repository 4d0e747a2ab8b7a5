"""Docs can't drift: the counts quoted in README/COVERAGE must match
the tree (regenerate with `python tools/update_counts.py`)."""

import subprocess
import sys
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_doc_counts_current():
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "update_counts.py"), "--check"],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stdout + r.stderr
