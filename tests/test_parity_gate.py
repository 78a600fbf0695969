"""Opt-in full parity gate: `pytest -m parity` runs every registered query
against its DuckDB oracle at sf0.01 — the same check the driver applies to
its 50-query window, extended to all 157 registered queries.

Excluded from the default run (pytest.ini deselects the `parity` marker)
because it takes ~3-5 min; it is the command to run before any commit that
touches query bodies or oracle SQL.  Mechanically identical to
`python tools/parity.py /root/testdata/sf0.01` — this wrapper exists so CI
and humans share one entry point with the rest of the suite.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parity
def test_full_parity_gate():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "parity.py"), "/root/testdata/sf0.01"],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=1800,
    )
    tail = "\n".join(proc.stdout.splitlines()[-30:])
    assert proc.returncode == 0, f"parity gate failed:\n{tail}\n{proc.stderr[-2000:]}"
    assert "all OK" in proc.stdout
