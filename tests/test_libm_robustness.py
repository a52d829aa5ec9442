"""Permanent gate: every transcendental-bearing oracle surface must be
invariant under a ±1e-9 relative perturbation of its ln/exp/power calls.

Why 1e-9: cross-host libm divergence (JVM Math.log intrinsics vs the
driver host's libc vs DuckDB's build) is a few ulps ~ 1e-15 relative;
gating at 1e-9 enforces a 10^6 safety margin. The driver REGENERATES
fixtures between rounds, so each round redraws the boundary lottery —
this test re-runs on whatever fixture the round shipped, catching a
freshly-degenerate margin before the driver does (the r7
dataset_weighted_sample red was this class).

sqrt is exempt: IEEE 754 requires it correctly rounded, so it is
bit-identical everywhere given bit-identical inputs (clears the whole
cosine family). power(2, int) sites were converted to integer shifts
in r8 (registry._BINPACK_SQL).
"""

import sys

import pytest

sys.path.insert(0, "/root/repo")

from tools.libm_audit import audit_entry, entry_delta, transcendental_entries

from .conftest import SF_CORRECT
from .oracle_harness import duckdb_conn

DELTA = 1e-9


def _targets():
    import __spark_entry__ as e

    return sorted(transcendental_entries(e.oracle_sql()).items())


@pytest.mark.parametrize("name,sql", _targets(), ids=lambda x: x if isinstance(x, str) and not x.lstrip().startswith(("WITH", "SELECT")) else None)
def test_oracle_invariant_under_libm_perturbation(name, sql):
    con = duckdb_conn(SF_CORRECT)
    # summed-term surfaces gate at 1e-12 (coherent-perturbation
    # pessimism — see tools.libm_audit.SUMMED_TERM_TIER)
    problems = audit_entry(con, sql, delta=entry_delta(name, DELTA))
    assert not problems, f"{name}: {problems}"
