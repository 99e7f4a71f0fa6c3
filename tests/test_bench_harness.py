"""Unit tests for bench.py's stall-proofing helpers (round 7): the
quiet-host record extraction must read both the raw bench JSON shape
and the driver's ``parsed``-wrapped shape, filter by scale factor, and
take the per-query minimum across rounds (min filters stalled runs).
No Spark needed.
"""

from __future__ import annotations

import json
from pathlib import Path

import bench

REPO = str(Path(__file__).resolve().parent.parent)


def _write(dirpath, name, payload):
    (dirpath / name).write_text(json.dumps(payload))


def test_records_read_both_shapes_and_take_min(tmp_path):
    _write(
        tmp_path,
        "BENCH_r01.json",
        {"sf": 0.1, "queries": {"q1": 2.0, "q2": 5.0}},  # raw shape
    )
    _write(
        tmp_path,
        "BENCH_r02.json",
        {  # driver-wrapped shape; q1 stalled this round (min ignores it)
            "sf": 0.1,
            "parsed": {"sf": 0.1, "queries": {"q1": 40.0, "q2": 1.5}},
        },
    )
    recs = bench.quiet_host_records(str(tmp_path), "0.1")
    assert recs == {"q1": 2.0, "q2": 1.5}


def test_records_filter_by_sf_and_tolerate_junk(tmp_path):
    _write(tmp_path, "BENCH_r01.json", {"sf": 0.01, "queries": {"q1": 9.0}})
    (tmp_path / "BENCH_r02.json").write_text("{not json")
    _write(tmp_path, "BENCH_r03.json", {"sf": 0.1, "queries": {"q1": 3.0}})
    _write(tmp_path, "OTHER.json", {"sf": 0.1, "queries": {"q1": 0.001}})
    assert bench.quiet_host_records(str(tmp_path), "0.1") == {"q1": 3.0}
    assert bench.quiet_host_records(str(tmp_path), "0.01") == {"q1": 9.0}


def test_real_repo_records_exist_for_drift_sentinels():
    recs = bench.quiet_host_records(REPO, "0.1")
    for q in bench.DRIFT_SENTINELS:
        assert recs.get(q, 0) > 0, f"no quiet-host record for sentinel {q}"
