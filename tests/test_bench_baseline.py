"""Pin bench.py's normalized-ratio baseline selection (r11 verdict task 3).

The bug being prevented: in round 11 the builder committed a clean
same-round stamp (BENCH_DETAIL_r11b.json) hours before the driver's
end-of-round bench run; the old newest-stamp rule normalized the driver's
run against it, so the driver artifact's norm_prev_shared_ratio measured
one hour of host drift (1.287, 60 phantom flags) instead of
round-over-round change. The rule now excludes stamps from the
currently-running round, where "currently running" is one past the newest
committed CORRECTNESS_r{N}.json.
"""

import json
import os

import bench


def _touch(d, name, payload=None):
    with open(os.path.join(d, name), "w") as f:
        json.dump(payload or {}, f)


def test_current_round_is_one_past_newest_correctness(tmp_path):
    d = str(tmp_path)
    _touch(d, "CORRECTNESS_r09.json")
    _touch(d, "CORRECTNESS_r11.json")
    _touch(d, "CORRECTNESS_r10.json")
    assert bench.current_round(d) == 12


def test_current_round_without_artifacts_is_sentinel(tmp_path):
    assert bench.current_round(str(tmp_path)) > 1 << 20


def test_same_round_stamp_excluded(tmp_path):
    """The exact r11 scenario: driver runs during round 11 (newest
    correctness file r10), builder has committed a same-round clean stamp
    r11b. Baseline must be the r10 stamp, not r11b."""
    d = str(tmp_path)
    for r in range(1, 11):
        _touch(d, f"CORRECTNESS_r{r:02d}.json")
    _touch(d, "BENCH_DETAIL_r09.json")
    _touch(d, "BENCH_DETAIL_r10.json")
    _touch(d, "BENCH_DETAIL_r11b.json")  # same-round: must be skipped
    picked = bench.pick_baseline_stamp(d)
    assert picked is not None
    assert os.path.basename(picked) == "BENCH_DETAIL_r10.json"


def test_prior_round_suffix_stamps_allowed(tmp_path):
    """A suffixed stamp from a PRIOR round (builder's clean r11b) is the
    right baseline for a round-12 run, beating the plain r11 stamp by
    name order within the same round."""
    d = str(tmp_path)
    for r in range(1, 12):
        _touch(d, f"CORRECTNESS_r{r:02d}.json")
    _touch(d, "BENCH_DETAIL_r10.json")
    _touch(d, "BENCH_DETAIL_r11.json")
    _touch(d, "BENCH_DETAIL_r11b.json")
    picked = bench.pick_baseline_stamp(d)
    assert os.path.basename(picked) == "BENCH_DETAIL_r11b.json"


def test_numeric_round_ordering_not_lexicographic(tmp_path):
    d = str(tmp_path)
    for r in range(1, 101):
        _touch(d, f"CORRECTNESS_r{r:02d}.json")
    _touch(d, "BENCH_DETAIL_r9.json")
    _touch(d, "BENCH_DETAIL_r100.json")
    picked = bench.pick_baseline_stamp(d)
    assert os.path.basename(picked) == "BENCH_DETAIL_r100.json"


def test_malformed_stamp_suffix_skipped_not_crash(tmp_path):
    """ADVICE r11 (bench.py:613): a stray BENCH_DETAIL_rX.json used to
    crash the whole bench run with AttributeError."""
    d = str(tmp_path)
    _touch(d, "CORRECTNESS_r05.json")
    _touch(d, "BENCH_DETAIL_rX.json")
    _touch(d, "BENCH_DETAIL_r04.json")
    picked = bench.pick_baseline_stamp(d)
    assert os.path.basename(picked) == "BENCH_DETAIL_r04.json"


def test_no_eligible_stamp_returns_none(tmp_path):
    d = str(tmp_path)
    _touch(d, "CORRECTNESS_r05.json")
    _touch(d, "BENCH_DETAIL_r06.json")  # same round — excluded
    _touch(d, "BENCH_DETAIL_rX.json")   # malformed — skipped
    assert bench.pick_baseline_stamp(d) is None


def test_flag_floor_suppresses_scheduler_noise():
    """r12 verdict item 4a: dq_k_anonymity_suppress read 2.72x normalized
    with both walls under 1.4 s and no code change — sub-floor flags are
    scheduler latency, not plans, and must be counted but not listed."""
    per_query = {"tiny": 2.72, "big": 1.66, "fine": 1.01}
    axis_of = {"tiny": "jvm", "big": "state", "fine": "jvm"}
    axes = {"jvm": 1.0, "py": 1.0, "state": 1.115}
    drift = {"jvm": 0.861, "py": 1.0, "state": 1.115}
    now = {"tiny": 1.35, "big": 11.2, "fine": 4.0}
    prev = {"tiny": 0.50, "big": 14.7, "fine": 4.0}
    flags, suppressed = bench.adjudicate_flags(
        per_query, axis_of, axes, drift, now, prev
    )
    assert suppressed == 1
    assert list(flags) == ["big"]
    f = flags["big"]
    assert f["axis"] == "state"
    assert f["axis_drift"] == 1.115
    assert f["raw_prev"] == 14.7 and f["raw_now"] == 11.2


def test_flag_floor_keeps_flag_when_either_wall_is_large():
    """A query that WAS fast and became slow (or vice versa) crosses the
    floor on one side and must still flag."""
    flags, suppressed = bench.adjudicate_flags(
        {"q": 2.0}, {"q": "jvm"}, {"jvm": 1.0}, {"jvm": 1.0},
        now={"q": 3.0}, prev={"q": 1.2},
    )
    assert suppressed == 0 and "q" in flags


def test_flag_annotations_carry_axis_context():
    flags, _ = bench.adjudicate_flags(
        {"r": 1.5}, {"r": "py"}, {"py": 0.9, "jvm": 1.0},
        {"py": 1.3, "jvm": 1.0}, now={"r": 2.0}, prev={"r": 2.0},
    )
    assert flags["r"] == {
        "norm_ratio": 1.5, "axis": "py", "axis_ratio": 0.9,
        "axis_drift": 1.3, "raw_prev": 2.0, "raw_now": 2.0,
        "verdict": "raw_flat_axis_driven",
    }


def test_retry_clears_intra_run_spike_flags():
    """A flag whose isolated retry re-normalizes under threshold was an
    intra-run spike — it moves to the cleared map, annotated with the
    retry evidence; a flag that survives its retry stays, also
    annotated."""
    regressions = {
        "spike": {"norm_ratio": 2.5, "axis": "jvm", "axis_ratio": 1.0,
                  "axis_drift": 1.0, "raw_prev": 4.0, "raw_now": 10.0},
        "real": {"norm_ratio": 1.8, "axis": "state", "axis_ratio": 1.0,
                 "axis_drift": 1.0, "raw_prev": 5.0, "raw_now": 9.0},
    }
    walls = {"spike": 4.2, "real": 8.8}
    cleared = bench.adjudicate_retries(
        regressions, {"jvm": 1.0, "state": 1.0}, lambda q: walls[q]
    )
    assert list(cleared) == ["spike"]
    assert cleared["spike"]["retry_wall"] == 4.2
    assert cleared["spike"]["retry_norm_ratio"] == 1.05
    assert "spike" not in regressions
    assert regressions["real"]["retry_wall"] == 8.8
    assert regressions["real"]["retry_norm_ratio"] == 1.76


def test_retry_cap_and_failures_are_safe():
    """Only the worst `cap` flags retry; a rerun that raises leaves its
    flag intact and unannotated."""
    regressions = {
        f"q{i}": {"norm_ratio": 3.0 - i * 0.1, "axis": "jvm",
                  "axis_ratio": 1.0, "axis_drift": 1.0,
                  "raw_prev": 4.0, "raw_now": 10.0}
        for i in range(4)
    }

    def rerun(q):
        if q == "q0":
            raise RuntimeError("transient")
        return 4.0

    cleared = bench.adjudicate_retries(
        regressions, {"jvm": 1.0}, rerun, cap=3
    )
    assert "q0" in regressions and "retry_wall" not in regressions["q0"]
    assert set(cleared) == {"q1", "q2"}          # q3 beyond cap
    assert "retry_wall" not in regressions["q3"]


def test_flag_verdict_separates_raw_flat_from_raw_slower():
    flags, _ = bench.adjudicate_flags(
        {"flat": 1.9, "slow": 1.9},
        {"flat": "state", "slow": "jvm"},
        {"state": 0.56, "jvm": 1.0},
        {"state": 1.3, "jvm": 1.0},
        now={"flat": 5.9, "slow": 9.0},
        prev={"flat": 6.2, "slow": 4.0},
    )
    assert flags["flat"]["verdict"] == "raw_flat_axis_driven"
    assert flags["slow"]["verdict"] == "raw_slower"
