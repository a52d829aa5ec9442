"""Driver-window rotation contract: queries() sorts stalest-first from the
CORRECTNESS_r*.json history (auto-derived — VERDICT r5 asked for the
hand-maintained map to go; VERDICT r6 asked this test to assert the
DERIVATION INVARIANT against whatever files exist, not an r5-era snapshot
that goes stale the moment the driver writes the next round's file).
"""

import glob
import json
import os
import re

from streamlit_projet_spark_streaming_spark.registry import (
    REGISTRY,
    _LAST_DRIVER_ROW,
    _last_driver_rows,
    queries,
)

WINDOW = 50

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _expected_rows(repo_dir: str) -> dict[str, int]:
    """Independent re-derivation of the green-round map: latest file wins;
    green oracle row or rows-only row that RAN -> that round; red/errored
    -> round 0 (front of the next driver window)."""
    rows: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(repo_dir, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"CORRECTNESS_r(\d+)\.json$", path).group(1))
        with open(path) as fh:
            data = json.load(fh)
        for name, rec in data.items():
            if rec.get("err") is None:
                green = bool(
                    rec.get("rows_match")
                    and rec.get("schema_match")
                    and rec.get("hash_match")
                )
            elif rec.get("err") == "no_oracle":
                green = rec.get("spark_rows") is not None
            else:
                green = False
            rows[name] = rnd if green else 0
    return rows


def test_rotation_derives_from_correctness_files():
    # The invariant, not a snapshot: the import-time map must equal an
    # independent re-derivation from whatever CORRECTNESS files exist.
    expected = _expected_rows(REPO)
    assert _last_driver_rows() == expected
    assert _LAST_DRIVER_ROW == expected
    # Structural sanity on the real files: every value is 0 or a round
    # number that actually has a file.
    rounds = {
        int(re.search(r"CORRECTNESS_r(\d+)\.json$", p).group(1))
        for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
    }
    assert set(expected.values()) <= rounds | {0}


def test_rotation_tracks_a_future_round_file(tmp_path):
    # Synthetic next-round fixture: a green row advances to the new round,
    # a red row and an exception row drop to 0, a rows-only row that ran
    # stays green, one that died drops to 0.
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps(
            {
                "a": {"rows_match": True, "schema_match": True,
                      "hash_match": True, "spark_rows": 5,
                      "oracle_rows": 5, "err": None},
                "b": {"rows_match": True, "schema_match": True,
                      "hash_match": True, "spark_rows": 5,
                      "oracle_rows": 5, "err": None},
                "c": {"rows_match": None, "schema_match": None,
                      "hash_match": None, "spark_rows": 9,
                      "oracle_rows": None, "err": "no_oracle"},
            }
        )
    )
    (tmp_path / "CORRECTNESS_r07.json").write_text(
        json.dumps(
            {
                "a": {"rows_match": True, "schema_match": True,
                      "hash_match": True, "spark_rows": 5,
                      "oracle_rows": 5, "err": None},
                "b": {"rows_match": True, "schema_match": True,
                      "hash_match": False, "spark_rows": 5,
                      "oracle_rows": 5, "err": None},
                "c": {"rows_match": None, "schema_match": None,
                      "hash_match": None, "spark_rows": None,
                      "oracle_rows": None, "err": "TypeError: boom"},
                "d": {"rows_match": None, "schema_match": None,
                      "hash_match": None, "spark_rows": 3,
                      "oracle_rows": None, "err": "no_oracle"},
            }
        )
    )
    rows = _last_driver_rows(str(tmp_path))
    assert rows == {"a": 7, "b": 0, "c": 0, "d": 7}


def test_window_leads_with_red_and_stale_rows():
    from streamlit_projet_spark_streaming_spark.registry import _effective_round

    order = list(queries())
    window = order[:WINDOW]
    # Effective-round-0 entries (red, never-checked, or carrying a
    # never-driver-checked oracle upgrade) fill the window FIRST; when
    # more than WINDOW exist (a big-batch round), the window must be
    # entirely round-0 and the overflow rotates in next round.
    zero = [n for n in REGISTRY if _effective_round(n)[0] == 0]
    if len(zero) <= WINDOW:
        for name in zero:
            assert name in window, f"red/stale {name} outside the driver window"
    else:
        assert all(_effective_round(n)[0] == 0 for n in window)
    # The window boundary is monotone: nothing outside the window is
    # staler than anything inside it.
    staleness = [_effective_round(n) for n in order]
    assert staleness == sorted(staleness)


def test_every_registry_entry_is_listed_once():
    names = list(queries())
    assert sorted(names) == sorted(REGISTRY)
    assert len(names) == len(set(names))


def test_latest_round_red_entries_lead_the_window():
    """A KNOWN driver failure (red row in the latest CORRECTNESS file)
    and a never-driver-checked oracle UPGRADE (rows-only green entry
    that now has an oracle) must outrank merely never-sampled entries
    inside the round-0 segment — both have something to prove next
    round."""
    from streamlit_projet_spark_streaming_spark.registry import (
        _LATEST_RED,
        _NO_ORACLE_GREEN,
        _effective_round,
        _latest_red_names,
    )

    assert _latest_red_names() == _LATEST_RED
    order = list(queries())
    priority = [
        n
        for n in REGISTRY
        if n in _LATEST_RED
        or (n in _NO_ORACLE_GREEN and REGISTRY[n].oracle is not None)
    ]
    if not priority:
        return
    worst_priority = max(order.index(n) for n in priority)
    plain_zero_positions = [
        order.index(n) for n in REGISTRY if _effective_round(n) == (0, 1)
    ]
    if plain_zero_positions:
        assert worst_priority < min(plain_zero_positions)
    # Every priority entry fits the window unless the priority set itself
    # overflows it (then the window must still be all-priority).
    if len(priority) <= WINDOW:
        assert worst_priority < WINDOW
    else:
        assert all(n in priority for n in order[:WINDOW])
