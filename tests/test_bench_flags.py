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
