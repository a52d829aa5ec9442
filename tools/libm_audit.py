"""Cross-host libm robustness audit for transcendental-bearing oracles.

The r7 driver proved that `ln`/`exp`/`pow` are NOT bit-identical across
hosts (JVM Math.log intrinsics vs the oracle host's libm vs DuckDB's
build): `dataset_weighted_sample` matched locally and flipped on the
driver. `sqrt` is exempt — IEEE 754 requires it correctly rounded, so
given bit-identical inputs it is bit-identical everywhere (as are
+ - * /), which clears the entire cosine family by construction.

Method: for every registry oracle whose SQL calls ln/exp/power/pow,
re-run it with EACH such call wrapped as ``(call * (1 ± delta))`` at
``delta = 1e-12`` — three to four orders of magnitude beyond any
observed cross-host libm divergence (a few ulps ~ 1e-15 relative; the
multiplicative form models libm's RELATIVE error and leaves exact
points like ln(1)=0 unperturbed, matching how correctly-rounded-at-
exact-points libms behave). If the canonicalized output (the driver's
own hash surface, via tests/oracle_harness.canonical_rows) is invariant
under both perturbations, no real libm can flip the entry on ANY host;
if it flips, the entry's ROUND/selection sits within delta of a
half-grid or rank boundary and must be converted to an exact-integer /
audit-form surface.

Run:  python tools/libm_audit.py [sf_dir] [entry ...]
      (LIBM_AUDIT_DELTA env overrides delta; default 1e-9, the SAME
      gate as tests/test_libm_robustness.py — a weaker CLI default
      would leave sf0.1-only boundaries in the 1e-12..1e-9 band
      unguarded by both, r8 review catch)
Exit 0 = all invariant.  Pinned permanently by
tests/test_libm_robustness.py at sf0.01.
"""

from __future__ import annotations

import re
import sys

_FUNCS = ("ln", "exp", "power", "pow")
_TOKEN = re.compile(r"\b(ln|exp|power|pow)\s*\(", re.IGNORECASE)

#: Entries whose hashed surface SUMS ~corpus-many individually-rounded
#: transcendental terms (per-doc NLL = Σ ROUND(tf·ln(p), 6)). The
#: multiplicative audit perturbs every term COHERENTLY — at δ=1e-9
#: roughly δ/grid of all terms flip together and some per-doc sum
#: moves — while real libm error is per-value ±few-ulps noise
#: (~1e-15, incoherent), so the coherent gate overstates their risk by
#: ~10^6. These audit at 1e-12 (still 1000× any real cross-host
#: spread); every PER-ROW surface keeps the strict 1e-9 gate.
SUMMED_TERM_TIER = frozenset(
    {"text_unigram_logprob", "text_bigram_logprob"}
)


def entry_delta(name: str, default: float) -> float:
    return min(default, 1e-12) if name in SUMMED_TERM_TIER else default


def _wrap_calls(sql: str, factor: str) -> tuple[str, int]:
    """Wrap every ln/exp/power/pow(<args>) call as ((call) * factor).

    Balanced-paren scan (oracle SQL contains no string literals with
    parens near these calls; a quote-aware scan guards the general case).
    Returns (new_sql, n_wrapped).
    """
    out = []
    i = 0
    n = 0
    while True:
        m = _TOKEN.search(sql, i)
        if not m:
            out.append(sql[i:])
            break
        start, open_paren = m.start(), m.end() - 1
        # find the matching close paren, skipping quoted strings
        depth = 0
        j = open_paren
        in_q: str | None = None
        while j < len(sql):
            c = sql[j]
            if in_q:
                if c == in_q:
                    in_q = None
            elif c in ("'", '"'):
                in_q = c
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0:
                    break
            j += 1
        assert depth == 0, f"unbalanced parens after {m.group(0)!r}"
        inner, _ = _wrap_calls(sql[open_paren + 1 : j], factor)
        call = f"{m.group(1)}({inner})"
        out.append(sql[i:start])
        out.append(f"(({call}) * {factor})")
        n += 1 + inner.count(factor)  # nested wraps counted via recursion
        i = j + 1
    return "".join(out), n


def transcendental_entries(oracles: dict[str, str]) -> dict[str, str]:
    return {
        name: sql for name, sql in oracles.items() if _TOKEN.search(sql)
    }


def audit_entry(con, sql: str, delta: float = 1e-12) -> list[str]:
    """Return [] if the oracle output is invariant under ±delta
    perturbation of every ln/exp/power call, else mismatch notes."""
    from tests.oracle_harness import canonical_rows

    base = canonical_rows(con.execute(sql).fetchdf())
    problems = []
    for sign, fac in (("+", f"(1.0 + {delta!r})"), ("-", f"(1.0 - {delta!r})")):
        wrapped, n = _wrap_calls(sql, fac)
        assert n > 0
        got = canonical_rows(con.execute(wrapped).fetchdf())
        if got != base:
            diff = list((got - base).items())[:3]
            problems.append(f"flips under {sign}{delta:g} perturbation: {diff}")
    return problems


def main() -> int:
    import os

    sys.path.insert(0, "/root/repo")
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    delta = float(os.environ.get("LIBM_AUDIT_DELTA", "1e-9"))

    import __spark_entry__ as e
    from tests.oracle_harness import duckdb_conn

    oracles = e.oracle_sql()
    targets = transcendental_entries(oracles)
    if only:
        unknown = only - set(targets)
        if unknown:
            # a typo'd entry name must not yield a zero-audit false green
            print(f"unknown/non-transcendental entries: {sorted(unknown)}")
            return 2
        targets = {k: v for k, v in targets.items() if k in only}
    con = duckdb_conn(sf_dir)
    bad = []
    for name, sql in sorted(targets.items()):
        try:
            problems = audit_entry(con, sql, delta=entry_delta(name, delta))
        except Exception as ex:  # noqa: BLE001 — report, keep sweeping
            problems = [f"audit error: {type(ex).__name__}: {ex}"]
        if problems:
            bad.append(name)
            for p in problems:
                print(f"FRAGILE {name}: {p}", flush=True)
        else:
            print(f"ROBUST {name}", flush=True)
    print(f"\n{len(targets)} transcendental oracles, {len(bad)} fragile")
    if bad:
        print("FRAGILE:", bad)
        return 1
    print("RESULT: ALL ROBUST")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
