"""tools/scale_evidence.py guards: the exponent arithmetic and the
alarm rule are the part a silent bug would corrupt — a wrong slope
turns the 100x-scale early-warning tier into noise (the r11 interval
join bug was caught precisely because wall_exp >> out_exp read loud)."""

import math

from tools.scale_evidence import parse_tiers, slope


def test_parse_tiers_orders_and_factors():
    tiers = parse_tiers("sf0.1=/a,sf1=/b,sf3=/c")
    assert tiers == [("sf0.1", "/a", 0.1), ("sf1", "/b", 1.0), ("sf3", "/c", 3.0)]


def test_slope_is_loglog_gradient():
    # quadratic growth between sf1 and sf3: 9x output over 3x data
    assert slope(9.0, 1.0, 3.0, 1.0) == 2.0
    # linear
    assert slope(30.0, 10.0, 3.0, 1.0) == 1.0
    # the r11 range-join reading reproduces: wall 4.6 -> 29.0 over 3x
    got = slope(29.0, 4.6, 3.0, 1.0)
    assert got is not None and abs(got - math.log(29 / 4.6) / math.log(3)) < 0.01


def test_slope_guards_degenerate_inputs():
    assert slope(0.0, 1.0, 3.0, 1.0) is None  # zero rows: no log
    assert slope(5.0, 0.0, 3.0, 1.0) is None
    assert slope(5.0, 1.0, 1.0, 1.0) is None  # same factor: no baseline


def test_parse_tiers_rejects_malformed_spec():
    """A bad --tiers spec must raise ValueError (main turns it into the
    exit-2 usage path) instead of an uncaught float-parse traceback."""
    import pytest

    with pytest.raises(ValueError, match="bad tier"):
        parse_tiers("base=/a")
    with pytest.raises(ValueError, match="bad tier"):
        parse_tiers("sf0.1")  # no '=' at all


def test_measure_times_eager_entry_construction(spark):
    """The entry call must sit INSIDE the timer: streaming entries run
    their query eagerly at construction and return the sink's batch
    frame, and the dedup/ANN families build shared intermediates on
    first touch. The first r13 sf10 run shipped with construction
    outside the timer and read the e2e flagship at 0.04 s over 10M
    events — this pins the fix with a planted eager sleep."""
    import time as _time

    from tools import scale_evidence as SE

    class EagerDef:
        def spark(self, session, sf_dir):
            _time.sleep(0.3)  # stands in for an eager stream/build
            return session.range(5)

    SE.CATALOG["_eager_probe"] = EagerDef()
    try:
        wall, rows = SE.measure(spark, "_eager_probe", "/unused")
        assert rows == 5
        assert wall >= 0.3, wall
    finally:
        del SE.CATALOG["_eager_probe"]
