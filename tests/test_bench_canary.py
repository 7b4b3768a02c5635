"""Host-canary factor pins (round 9, VERDICT r8 item 6): bench.py's
cross-round self-normalization must stay robust to failed or missing
canary runs — a bench that crashes while REPORTING would lose the
whole round's numbers."""

from __future__ import annotations

from bench import CANARY_ANCHORS, canary_factor


def test_canary_factor_median_of_ratios():
    warm = {k: v * 1.5 for k, v in CANARY_ANCHORS.items()}
    assert canary_factor(warm) == 1.5


def test_canary_factor_single_survivor():
    # one canary failed (-1.0 sentinel): factor comes from the other
    k1, k2 = sorted(CANARY_ANCHORS)
    warm = {k1: CANARY_ANCHORS[k1] * 2.0, k2: -1.0}
    assert canary_factor(warm) == 2.0


def test_canary_factor_none_when_all_missing():
    assert canary_factor({}) is None
    assert canary_factor({k: -1.0 for k in CANARY_ANCHORS}) is None


def test_anchors_are_the_reference_host_values():
    # the r7 reference host's warm medians — changing these rebases
    # every cross-round comparison, so pin them
    assert CANARY_ANCHORS == {"q34_str_funcs": 0.138,
                              "q25_win_topk": 0.330}


def test_steal_probe_shape_and_bounds():
    # the probe must always produce n positive timings (a bench that
    # crashes while REPORTING host health would lose the round's
    # numbers — same rule as the canary), and the workload must be
    # heavy enough to see steal (16M doubles) but bounded
    from bench import STEAL_PROBE_QUIET_S, steal_probe

    runs = steal_probe(n_runs=2)
    assert len(runs) == 2
    assert all(isinstance(r, float) and r > 0 for r in runs)
    # the quiet reference is a constant the report embeds; keep it
    # honest against accidental edits
    assert STEAL_PROBE_QUIET_S == 0.2


def test_steal_sustained_excludes_transition_run():
    # run 0 carries the idle->busy page-reclaim penalty even on a
    # healthy host (round 11: 3-25s while runs 1+ sat at 0.13s);
    # the gate number must not be poisoned by it
    from bench import steal_sustained

    assert steal_sustained([10.9, 0.14, 0.12], [6.5, 0.16, 0.18]) == 0.15
    # true-steal regime: later runs are slow too, and the gate sees it
    assert steal_sustained([10.9, 4.2, 5.0]) == 4.6
    # degenerate single-run triplets fall back to the overall median
    assert steal_sustained([0.2]) == 0.2


def test_wait_quiet_two_regime_decision():
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__),
                                    "..", "scripts"))
    from wait_quiet import is_quiet

    # transition-penalty regime: huge run 0, quiet sustained -> quiet
    assert is_quiet([25.2, 0.13, 0.12, 0.14], quiet_ref=0.35)
    # true-steal regime: later runs degraded too -> not quiet
    assert not is_quiet([10.9, 0.18, 4.2, 0.14], quiet_ref=0.35)
    # uniformly slow -> not quiet
    assert not is_quiet([3.0, 2.0, 2.5, 2.2], quiet_ref=0.35)
    # single-run probe falls back to the overall median
    assert is_quiet([0.2], quiet_ref=0.35)
