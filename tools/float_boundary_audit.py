"""Floor-boundary distance audit for the two operators that hash
floor-scaled TRANSCENDENTAL longs (ADVICE r8 item 3).

The engine's standing rule is that log-derived floats are either
rank-hashed or hard-coded as integer tables, because JVM Math.log and
libm disagree by up to 1 ulp — a scaled term within ~1 ulp of an
integer can floor differently per engine and flip a hashed long.  Two
certified surfaces intentionally keep per-term floors
(``char_entropy``: floor(n·ln n·1e6); ``perplexity_kn``:
floor(−ln p·1e6)).  This audit MEASURES, instead of assumes, that no
term in their actual domains sits near a floor boundary:

- char_entropy is audited DATA-INDEPENDENTLY: its floats are a pure
  function of an integer run length n, so sweeping n = 2..N_MAX
  certifies every corpus whose longest char run is <= N_MAX.
- perplexity_kn is data-dependent: the distinct (c_vw, c_v, n1_v,
  n1_w, T) tuples are rebuilt from the parquet corpus with the exact
  oracle count semantics and each term's distance is measured.

A term is UNSAFE if its distance to the nearest integer is < MARGIN
ulps of the scaled value (1-ulp input error in ln grows to at most a
few ulps of x through the fixed expression tree; 8 ulps is an
order-of-magnitude safety factor).  Exit 1 on any unsafe term.

Usage: python tools/float_boundary_audit.py [sf_dir] [n_max]
"""

from __future__ import annotations

import math
import sys

MARGIN_ULPS = 8.0


def _dist_ulps(x: float) -> float:
    """Distance of x to its nearest integer, in units of ulp(x)."""
    d = abs(x - round(x))
    return d / math.ulp(x) if x != 0 else float("inf")


def audit_char_entropy(n_max: int) -> tuple[float, int]:
    """Sweep run/doc lengths: the ONLY floored float after the round-9
    fix is ln(n)·1e6 (the per-run term is the integer multiple
    n·floor(ln(n)·1e6); the old floor(n·ln(n)·1e6) form sat EXACTLY on
    a boundary at n = 22988 — kept out by construction now)."""
    worst, worst_n = float("inf"), -1
    for n in range(2, n_max + 1):
        r = _dist_ulps(math.log(n) * 1e6)
        if r < worst:
            worst, worst_n = r, n
    return worst, worst_n


def audit_perplexity_kn(sf_dir: str, discount: float = 0.75):
    """Rebuild the KN count tuples with the oracle's semantics and
    measure every distinct term's boundary distance."""
    import duckdb

    con = duckdb.connect()
    q = f"""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk
      FROM read_parquet('{sf_dir}/documents.parquet') WHERE trim(text) <> ''
    ),
    b AS (
      SELECT tk[g] AS v, tk[g + 1] AS w FROM (
        SELECT tk, unnest(generate_series(1, len(tk) - 1)) AS g
        FROM t WHERE len(tk) >= 2
      )
    ),
    bc AS (SELECT v, w, COUNT(*) AS c_vw FROM b GROUP BY 1, 2),
    ctx AS (SELECT v, CAST(SUM(c_vw) AS BIGINT) AS c_v,
            COUNT(*) AS n1_v FROM bc GROUP BY 1),
    cont AS (SELECT w, COUNT(*) AS n1_w FROM bc GROUP BY 1),
    ty AS (SELECT COUNT(*) AS t FROM bc)
    SELECT DISTINCT CAST(c_vw AS BIGINT), c_v, CAST(n1_v AS BIGINT),
           CAST(n1_w AS BIGINT), CAST(t AS BIGINT)
    FROM bc JOIN ctx USING (v) JOIN cont USING (w) CROSS JOIN ty
    """
    tuples = con.execute(q).fetchall()
    worst, worst_t, n_terms = float("inf"), None, 0
    for c_vw, c_v, n1_v, n1_w, t in tuples:
        # the engine/oracle expression tree, order-faithful
        p = (max(c_vw - discount, 0.0) + (discount * n1_v) * (n1_w / t)) / c_v
        x = -math.log(p) * 1e6
        r = _dist_ulps(x)
        n_terms += 1
        if r < worst:
            worst, worst_t = r, (c_vw, c_v, n1_v, n1_w, t)
    return worst, worst_t, n_terms


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_max = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    ce_worst, ce_n = audit_char_entropy(n_max)
    print(
        f"char_entropy: runs 2..{n_max}, min boundary distance = "
        f"{ce_worst:.1f} ulp (at n = {ce_n})"
    )
    kn_worst, kn_t, kn_n = audit_perplexity_kn(sf_dir)
    print(
        f"perplexity_kn: {kn_n} distinct count tuples at {sf_dir}, "
        f"min boundary distance = {kn_worst:.1f} ulp (at tuple {kn_t})"
    )
    bad = []
    if ce_worst < MARGIN_ULPS:
        bad.append("char_entropy")
    if kn_worst < MARGIN_ULPS:
        bad.append("perplexity_kn")
    print(f"UNSAFE (within {MARGIN_ULPS} ulp of a floor boundary): {bad or 'NONE'}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
