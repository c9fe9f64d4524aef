"""Unit tests for bench.py's timing harness (pure host logic — the relay
robustness machinery must behave deterministically)."""

import time

import bench


def test_robust_best_stops_at_min_reps_when_under_threshold():
    calls = {"n": 0}

    def fast():
        calls["n"] += 1

    res = bench._robust_best({"m": (fast, 10.0, 3)})
    best, n = res["m"]
    assert n == 3 and calls["n"] == 3
    assert best < 10.0


def test_robust_best_rides_out_outliers_up_to_max_extra():
    calls = {"n": 0}

    def slow():
        calls["n"] += 1
        time.sleep(0.01)

    # floor 1 us, outlier 2.5 -> 0.01 s readings always "stalled":
    # must stop at min_reps + max_extra.
    res = bench._robust_best({"m": (slow, 1e-6, 2)}, max_extra=3)
    _, n = res["m"]
    assert n == 2 + 3 and calls["n"] == 5


def test_robust_best_deadline_settles_for_min_reps():
    calls = {"n": 0}

    def slow():
        calls["n"] += 1
        time.sleep(0.01)

    # Deadline already passed: stop at min_reps even though readings
    # exceed the outlier threshold.
    res = bench._robust_best(
        {"m": (slow, 1e-6, 2)}, deadline=time.perf_counter() - 1
    )
    _, n = res["m"]
    assert n == 2 and calls["n"] == 2


def test_robust_best_interleaves_all_workloads():
    order = []
    res = bench._robust_best(
        {
            "a": (lambda: order.append("a"), 10.0, 2),
            "b": (lambda: order.append("b"), 10.0, 2),
        }
    )
    assert res["a"][1] == 2 and res["b"][1] == 2
    # Round-robin: each round touches every active workload once.
    assert order in (["a", "b", "a", "b"], ["b", "a", "b", "a"])
