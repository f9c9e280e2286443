"""Noise-aware bench mechanics (round-9 VERDICT task 2): the committed
artifact must carry host-load evidence so "regression or host load?" is
answered by the JSON, not by a round of adjudication prose."""

from __future__ import annotations

import bench


def test_contamination_threshold():
    # 32-core host: gate at 0.125 * 32 = 4.0
    assert not bench._contaminated(0.3, 32)
    assert not bench._contaminated(4.0, 32)
    assert bench._contaminated(4.01, 32)
    assert bench._contaminated(17.5, 32)
    # small host: absolute floor of 2.0, never sub-core paranoia
    assert not bench._contaminated(1.9, 4)
    assert bench._contaminated(2.1, 4)
    # /proc unavailable: cannot judge, leave unflagged
    assert not bench._contaminated(None, 32)


def test_loadavg_shape():
    la = bench._loadavg()
    # on this container /proc/loadavg exists; contract is 3 floats
    assert la == [] or (len(la) == 3 and all(x >= 0.0 for x in la))


def test_steal_fraction():
    # ticks: user nice system idle iowait irq softirq steal
    before = [100, 0, 50, 1000, 0, 0, 0, 10]
    # busy delta = 700 user + 100 system + 90 steal = 890; idle excluded
    after = [800, 0, 150, 5000, 0, 0, 0, 100]
    frac = bench._steal_fraction(before, after)
    assert abs(frac - 90 / 890) < 1e-9
    # threshold semantics: 10% steal flags, 1% does not
    assert frac > bench._CONTAMINATION_STEAL_FRACTION
    quiet = bench._steal_fraction(before, [1000, 0, 150, 5000, 0, 0, 0, 19])
    assert quiet < bench._CONTAMINATION_STEAL_FRACTION
    # missing /proc or zero busy time: cannot judge
    assert bench._steal_fraction(None, after) is None
    assert bench._steal_fraction(before, None) is None
    assert bench._steal_fraction(before, before) == 0.0


def test_cpu_ticks_shape():
    t = bench._cpu_ticks()
    assert t is None or (len(t) == 8 and all(x >= 0 for x in t))
