"""Driver-window rotation contract: queries() sorts stalest-first from the
CORRECTNESS_r*.json history (auto-derived — VERDICT r5 asked for the
hand-maintained map to go)."""

from streamlit_projet_spark_streaming_spark.registry import (
    REGISTRY,
    _LAST_DRIVER_ROW,
    _last_driver_rows,
    queries,
)

WINDOW = 50


def test_rotation_derives_from_correctness_files():
    rows = _last_driver_rows()
    # r5 recorded text_quality_classifier as a hash fail -> round 0, so it
    # must lead the r6 window; entries green in r5 carry round 5.
    assert rows["text_quality_classifier"] == 0
    assert rows["latest_events"] == 5
    assert rows["dedup_exact"] == 5
    assert _LAST_DRIVER_ROW == rows


def test_window_leads_with_red_and_stale_rows():
    order = list(queries())
    window = order[:WINDOW]
    # Round-0 entries (red or never-checked) fill the window FIRST; when
    # more than WINDOW exist (a big-batch round), the window must be
    # entirely round-0 and the overflow rotates in next round.
    zero = [n for n in REGISTRY if _LAST_DRIVER_ROW.get(n, 0) == 0]
    if len(zero) <= WINDOW:
        for name in zero:
            assert name in window, f"red/stale {name} outside the driver window"
    else:
        assert all(_LAST_DRIVER_ROW.get(n, 0) == 0 for n in window)
    # The window boundary is monotone: nothing outside the window is
    # staler than anything inside it.
    staleness = [_LAST_DRIVER_ROW.get(n, 0) for n in order]
    assert staleness == sorted(staleness)


def test_every_registry_entry_is_listed_once():
    names = list(queries())
    assert sorted(names) == sorted(REGISTRY)
    assert len(names) == len(set(names))
