"""Pin bench.py's quiet-gate semantics (derive_quiet_flags — pure, no
Spark): quiet_regime certifies each REPORTED minimum's own sweep plus the
tail; fully_quiet_run keeps the stricter r11 all-intervals meaning."""

import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "bench", os.path.join(os.path.dirname(os.path.dirname(__file__)), "bench.py")
)
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)

QUIET = {"gemm_sec": 0.05, "pyloop_sec": 0.8}
BANDED = {"gemm_sec": 0.4, "pyloop_sec": 1.2}


def _series(sweep_steals, snap_quiet=(True,) * 6, pre_steal=0.0, warm_steal=0.0, tail_steal=0.0):
    ats = ["pre", "post_warmup", "after_sweep_1", "after_sweep_2", "after_sweep_3", "post_calibration"]
    steals = [pre_steal, warm_steal, *sweep_steals, tail_steal]
    return [
        {"at": at, **(QUIET if q else BANDED), "steal_pct_since_prev": st}
        for at, q, st in zip(ats, snap_quiet, steals)
    ]


def test_all_clean_is_quiet_and_fully_quiet():
    s = _series([0.1, 0.2, 0.0])
    q, f, clean = bench.derive_quiet_flags(s, QUIET, {"a": 1, "b": 3})
    assert q and f and clean == {1: True, 2: True, 3: True}


def test_warmup_steal_does_not_taint_sweeps():
    # Steal during process start / warm-up only: no reported number is
    # bracketed by those intervals, so both flags hold (ADVICE r11).
    s = _series([0.1, 0.2, 0.0], pre_steal=35.0, warm_steal=12.0)
    q, f, _ = bench.derive_quiet_flags(s, QUIET, {"a": 1})
    assert q and f


def test_stolen_sweep_only_fails_mins_taken_from_it():
    s = _series([0.3, 9.0, 0.4])  # sweep 2 stolen
    q1, f1, clean = bench.derive_quiet_flags(s, QUIET, {"a": 1, "b": 3})
    assert q1 and not f1 and clean[2] is False
    q2, f2, _ = bench.derive_quiet_flags(s, QUIET, {"a": 1, "b": 2})
    assert not q2 and not f2


def test_banded_boundary_probe_fails_the_adjacent_sweep():
    # after_sweep_1 snapshot banded: it bounds sweep 1 (its end) AND
    # sweep 2 (its start) — mins from either cannot certify.
    snapq = (True, True, False, True, True, True)
    s = _series([0.1, 0.1, 0.1], snap_quiet=snapq)
    q, f, clean = bench.derive_quiet_flags(s, QUIET, {"a": 3})
    assert clean == {1: False, 2: False, 3: True}
    assert q and not f


def test_dirty_tail_fails_quiet_even_with_clean_sweeps():
    s = _series([0.1, 0.1, 0.1], tail_steal=8.0)
    q, f, _ = bench.derive_quiet_flags(s, QUIET, {"a": 1})
    assert not q and not f
    q2, f2, _ = bench.derive_quiet_flags(_series([0.1, 0.1, 0.1]), BANDED, {"a": 1})
    assert not q2  # banded final min-of-3 anchor also fails the tail


def test_non_linux_steal_none_falls_back_to_calibration_only():
    s = _series([None, None, None], pre_steal=None, warm_steal=None, tail_steal=None)
    q, f, _ = bench.derive_quiet_flags(s, QUIET, {"a": 2})
    assert q and f
