"""Progress/ETA tracker parity with reference util/progressStats.js:
percentage rounding, average-rate ETA, the unit-rollover format ladder,
and the print-then-increment ordering of beginTask."""

from timezone_boundary_builder_spark.plans.progress import (
    ProgressStats,
    format_duration,
)


def test_format_duration_ladder():
    assert format_duration(12.34) == "12.3 seconds"
    assert format_duration(59.94) == "59.9 seconds"
    assert format_duration(59.96) == "1.0 minutes"  # rounds to 60.0 s -> minutes
    assert format_duration(90) == "1.5 minutes"
    assert format_duration(3 * 3600) == "3.0 hours"
    assert format_duration(36 * 3600) == "1.5 days"


def test_percentage_and_eta_with_fake_clock():
    t = [100.0]
    ps = ProgressStats("zones", 10, clock=lambda: t[0])
    assert ps.time_left() == "?"
    assert ps.percentage() == 0.0
    ps.log_next()  # task 1 begins at t=100
    t[0] = 104.0  # 4s elapsed, 1 task counted -> 4 s/task, 9 left
    assert ps.percentage() == 10.0
    assert ps.time_left() == "36.0 seconds"
    for _ in range(4):
        ps.log_next()
    t[0] = 120.0  # 20s elapsed, 5 tasks -> 4 s/task, 5 left
    assert ps.percentage() == 50.0
    assert ps.time_left() == "20.0 seconds"


def test_begin_task_prints_before_increment(capsys):
    t = [0.0]
    ps = ProgressStats("dl", 4, clock=lambda: t[0])
    ps.begin_task("first", log_time_left=True)
    err = capsys.readouterr().err
    # printed BEFORE counting: 0% and unknown ETA, like the reference
    assert err == "first; dl progress: 0.0% done - ? left\n"
    ps.begin_task("second")
    assert capsys.readouterr().err == "second; dl progress: 25.0% done\n"
    assert ps.task_counter == 2


def test_rounding_is_half_up_like_js():
    # Math.round(62.5) = 63 in JS; Python's bankers round would give 62
    ps = ProgressStats("x", 16)
    ps.log_next()
    assert ps.percentage() == 6.3
    # toFixed(1) half-up at the unit boundary
    assert format_duration(59.95) == "1.0 minutes"
