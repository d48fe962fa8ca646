"""Pin bench.py's BENCH_full.json retention policy.

The judged artifact must always reflect the CURRENT code: an incumbent
produced by a different commit is never retained, regardless of host
health. Within one commit, a clearly-contended re-run may not clobber a
healthy measurement of the same code (documented 4-8x invisible
co-tenant degradation on this host). Corrupt incumbents must never
crash the bench after the measurement work is done.
"""

import json
import os

import bench


def _run(probe, commit="c1", value=1.0, sf=0.1):
    return {
        "metric": "headline_queries_total",
        "value": value,
        "cpu_probe_miters": probe,
        "git_commit": commit,
        "sf": sf,
    }


def _read(d, name):
    with open(os.path.join(d, name)) as f:
        return json.load(f)


def test_no_incumbent_always_writes(tmp_path):
    d = str(tmp_path)
    bench._write_sidecars(d, _run(5.0, "c1"))
    assert _read(d, "BENCH_full.json")["cpu_probe_miters"] == 5.0
    assert _read(d, "BENCH_full_last.json")["cpu_probe_miters"] == 5.0


def test_cross_commit_incumbent_never_retained(tmp_path):
    d = str(tmp_path)
    bench._write_sidecars(d, _run(30.0, "old-commit", value=10.0))
    # new code, terrible host: the stale-code incumbent must still fall
    bench._write_sidecars(d, _run(4.0, "new-commit", value=99.0))
    got = _read(d, "BENCH_full.json")
    assert got["git_commit"] == "new-commit"
    assert got["value"] == 99.0


def test_same_commit_contended_rerun_kept_out(tmp_path):
    d = str(tmp_path)
    bench._write_sidecars(d, _run(30.0, "c1", value=10.0))
    bench._write_sidecars(d, _run(6.0, "c1", value=80.0))
    # healthy same-commit incumbent retained in the judged artifact...
    assert _read(d, "BENCH_full.json")["value"] == 10.0
    # ...but the raw latest run is always disclosed
    assert _read(d, "BENCH_full_last.json")["value"] == 80.0


def test_same_commit_comparable_health_replaces(tmp_path):
    d = str(tmp_path)
    bench._write_sidecars(d, _run(30.0, "c1", value=10.0))
    bench._write_sidecars(d, _run(27.0, "c1", value=9.0))
    assert _read(d, "BENCH_full.json")["value"] == 9.0


def test_corrupt_incumbent_replaced_not_crash(tmp_path):
    d = str(tmp_path)
    with open(os.path.join(d, "BENCH_full.json"), "w") as f:
        json.dump([1, 2, 3], f)  # array, not dict: .get would raise
    bench._write_sidecars(d, _run(5.0, "c1", value=7.0))
    assert _read(d, "BENCH_full.json")["value"] == 7.0


def test_unstamped_incumbent_replaced(tmp_path):
    # pre-round-9 artifacts carry no git_commit: treated as stale
    d = str(tmp_path)
    with open(os.path.join(d, "BENCH_full.json"), "w") as f:
        json.dump({"value": 1.0, "cpu_probe_miters": 40.0}, f)
    bench._write_sidecars(d, _run(5.0, "c1", value=7.0))
    assert _read(d, "BENCH_full.json")["value"] == 7.0


def test_git_commit_stamp_resolves():
    here = os.path.dirname(os.path.abspath(bench.__file__))
    c = bench._git_commit(here)
    assert c == "unknown" or (len(c) == 40 and all(
        ch in "0123456789abcdef" for ch in c
    ))


def test_non_driver_sf_never_touches_judged_artifact(tmp_path):
    """A developer smoke at sf0.01 lands only in BENCH_full_last.json —
    the judged artifact records the driver's scale (0.1) exclusively
    (an sf0.01 run clobbered it once; this pins the guard)."""
    d = str(tmp_path)
    bench._write_sidecars(d, _run(5.0, "c1", sf=0.1))
    bench._write_sidecars(d, _run(50.0, "c2", value=9.9, sf=0.01))
    assert _read(d, "BENCH_full.json")["sf"] == 0.1
    assert _read(d, "BENCH_full.json")["git_commit"] == "c1"
    assert _read(d, "BENCH_full_last.json")["sf"] == 0.01
