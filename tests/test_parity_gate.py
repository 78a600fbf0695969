"""Opt-in full parity gate: `pytest -m parity` runs every registered query
against its DuckDB oracle at sf0.01 — the same check the driver applies to
its 50-query window, extended to the full registry (every entry in
`plans.queries.QUERIES` — 220 as of r16; the count is computed, not pinned).

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


def test_driver_window_keeps_staleness_bounded():
    """r15 (r14 verdict task 7): the shipped DRIVER_WINDOW must keep every
    registered query's driver-check staleness <= 5 rounds, checked at test
    time instead of waiting for a judge.  Simulates the next driver run:
    window rows go green at DRIVER_WINDOW_ROUND; every other query keeps
    its last green round from the committed CORRECTNESS_r*.json records.
    Also pins the standing policy that never-driver-checked registrations
    are always in the window."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "window_planner", os.path.join(REPO, "tools", "window_planner.py")
    )
    wp = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(wp)

    from re_data_pipeline_spark.plans.queries import (
        DRIVER_WINDOW,
        DRIVER_WINDOW_ROUND,
        QUERIES,
    )

    green = wp.last_green()
    window = set(DRIVER_WINDOW)
    never = [q for q in QUERIES if q not in green and q not in window]
    assert not never, (
        f"registered but never driver-checked and NOT in DRIVER_WINDOW: {never}"
    )
    stale = {
        q: DRIVER_WINDOW_ROUND - green[q]
        for q in QUERIES
        if q not in window and DRIVER_WINDOW_ROUND - green[q] > 5
    }
    assert not stale, (
        "DRIVER_WINDOW rotation mistake — these queries' driver checks will "
        f"be >5 rounds stale after the round-{DRIVER_WINDOW_ROUND} run "
        f"(rotate them in, see tools/window_planner.py): {stale}"
    )


@pytest.mark.leakaudit
def test_full_leak_audit_gate():
    """Opt-in storage-release gate (`pytest -m leakaudit`): every registered
    query, materialized once and released through the client release path,
    must return executor storage to baseline — no clearCache, so persisted
    AND checkpoint leaks both fail.  The command to run before any commit
    that touches operator pin/checkpoint handling; found 7 violations when
    first run (r15)."""
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "leak_audit.py"),
         "/root/testdata/sf0.001"],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=1800,
    )
    tail = "\n".join(proc.stdout.splitlines()[-15:])
    assert proc.returncode == 0, f"leak audit failed:\n{tail}\n{proc.stderr[-2000:]}"
    assert "all queries release to baseline" in proc.stdout
