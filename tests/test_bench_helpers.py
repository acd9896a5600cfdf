"""Cheap guards on bench.py's helper contract — the driver records
BENCH_r{N}.json from bench.py's single JSON line, so a broken helper
(e.g. the calm-gate tuple return, or a probe raising) silently costs
the round its benchmark artifact. The full end-to-end contract is
exercised by `SPARK_GRAFT_CALM_WAIT=0 python bench.py` (CLAUDE.md);
these tests pin the pieces that can break without Spark."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import bench


def test_calm_gate_skip_returns_probe_and_real_ratio():
    probe_s, par = bench._wait_for_calm_host(0)
    assert 0 < probe_s < 10  # seconds for a 1e6 sort, any host state
    # r4 ADVICE: even with a zero wait budget the parallel probe must
    # RUN — the artifact never carries a -1.0 sentinel where it claims
    # to record many-core host state
    assert 0.1 < par < 1000


def test_parallel_probe_returns_finite_ratio():
    r = bench._parallel_probe(workers=2)
    assert 0.1 < r < 1000


def test_rerun_reason_rules():
    # clean pair, calm probes -> no rerun
    assert bench._rerun_reason([(1.0, 4.0), (1.2, 4.5)]) is None
    # >3x spread between passes -> rerun even if probes were calm
    assert bench._rerun_reason([(1.0, 4.0), (3.5, 4.0)]) == "pass spread >3x"
    # best pass measured at a failed probe -> rerun
    assert (
        bench._rerun_reason([(1.0, 9.0), (1.4, 4.0)]) == "best at failed probe"
    )
    # the WORSE pass at a failed probe doesn't matter if the best is calm
    assert bench._rerun_reason([(1.0, 4.0), (1.4, 9.0)]) is None
    # single-pass runs can still be probe-flagged
    assert bench._rerun_reason([(2.0, 7.0)]) == "best at failed probe"


def test_sf_from_dir():
    assert bench._sf_from_dir("/root/testdata/sf0.01") == 0.01
    assert bench._sf_from_dir("/root/testdata/sf0.1/") == 0.1
    assert bench._sf_from_dir("/weird/path") == 0.1  # documented fallback
