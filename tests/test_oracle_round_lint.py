"""Mechanical closure of the ROUND-on-double class (round-10).

Rounds 7-10 converted every class-3/4 float-ROUND publisher (a checked
DOUBLE produced by ``ROUND(float expr, n)`` diverges across engines at
a half boundary — Spark rounds the exact binary value HALF_UP, DuckDB
rounds the scaled multiply). ``AUDIT_ROUND_DOUBLES.md`` records the
worklist as empty; this lint makes that claim MACHINE-CHECKED for every
oracle of every registered query, forever: each remaining ``ROUND(``
site must match one of the reviewed-safe families, or appear verbatim
in the frozen reviewed-one-off allowlist. A new ROUND added to any
oracle fails here before it can hash-mismatch at some future SF.

Safe families (why each is safe):

- ``micro-recovery``  ``ROUND(x * 1000000)``: x is a published 6-dp
  double sitting within ulps of the 1e-6 grid — 5e-7 from any half
  boundary; both engines recover the same integer.
- ``cents-recovery``  ``ROUND(x * 100[, 0])``: x is a raw 2-dp ingest
  double; same grid argument at 1e-2.
- ``int-recovery``    ``ROUND(col)``: an integral-valued raw double
  (within 1 ulp of an integer — never near .5).
- ``raw-2dp-recovery``  ``ROUND(col, 2)``: a bare raw 2-dp column —
  both engines round the same short-decimal value back to itself.
- ``dsum-publish``    ``ROUND(CAST(<decimal-exact sum> AS DOUBLE)
  [/ n], k)``: the dsum/davg discipline — the rounded value derives
  from an EXACT decimal, so both engines round the same short-decimal
  number; the accepted residual is DuckDB's 1-ulp decimal→double cast
  (class 1 LOW in AUDIT_ROUND_DOUBLES.md — a floor publish cannot
  remove a 1-ulp INPUT difference either).
"""

from __future__ import annotations

import re

from squonk2_fastapi_ws_event_stream_spark.registry import ORACLES

# Reviewed one-off sites (normalized whitespace, verbatim). Each entry
# was hand-classified; adding to this list is a review act.
ALLOWLIST = {
    # e40: locf is INTEGER cents; cents/100.0 is the correctly-rounded
    # double of a 2-dp value, ≥ 1/200 - ulp away from any 2-dp half
    # boundary — the ROUND is an identity on both engines.
    "ROUND(CAST(COALESCE(locf, -100) AS DOUBLE) / 100.0, 2)",
    # q47-family: window sums of DECIMAL(18,2) columns cast to double —
    # the dsum discipline with the DECIMAL cast on the source column
    # (these sites' sums are over `price` already typed DECIMAL in a
    # prior CTE, so the text lacks 'DECIMAL(').
    "ROUND(CAST(first_value(price) OVER w_total AS DOUBLE), 2)",
    "ROUND(CAST(nth_value(price, 2) OVER w_total AS DOUBLE), 2)",
    "ROUND(CAST(SUM(price) OVER (w_total ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE), 2)",
    "ROUND(CAST(SUM(price) OVER (PARTITION BY o_custkey ORDER BY day_num RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS DOUBLE), 2)",
    # decimal-typed single values cast to double at their own scale
    # (2-dp decimals → the rounded value IS the stored value).
    "ROUND(CAST(s.best_price AS DOUBLE), 2)",
    "ROUND(CAST(total_balance AS DOUBLE), 2)",
    "ROUND(CAST(total_balance - COALESCE(LAG(total_balance) OVER (ORDER BY month), CAST(0 AS DECIMAL(18,2))) AS DOUBLE), 2)",
    "ROUND(CAST(m.rev_merged AS DOUBLE), 4)",
    "ROUND(CAST(rev_d AS DOUBLE), 4)",
    # q29: tot_vol is the exact DECIMAL sum from the agg CTE — dsum
    # discipline with the decimal typing a CTE boundary away.
    "ROUND(CAST(tot_vol AS DOUBLE), 2)",
}


def _sites(sql: str) -> list[str]:
    out = []
    for m in re.finditer(r"ROUND\(", sql):
        i = m.end()
        depth = 1
        while depth and i < len(sql):
            if sql[i] == "(":
                depth += 1
            elif sql[i] == ")":
                depth -= 1
            i += 1
        out.append(re.sub(r"\s+", " ", sql[m.start() : i]).strip())
    return out


def _split_digits(arg: str) -> tuple[str, str | None]:
    """Split the top-level trailing ', <digits>' if present."""
    depth = 0
    for i in range(len(arg) - 1, -1, -1):
        c = arg[i]
        if c == ")":
            depth += 1
        elif c == "(":
            depth -= 1
        elif c == "," and depth == 0:
            tail = arg[i + 1 :].strip()
            if re.fullmatch(r"\d+", tail):
                return arg[:i].strip(), tail
            return arg.strip(), None
    return arg.strip(), None


def classify(site: str) -> str | None:
    arg = site[len("ROUND(") : -1]
    arg0, digits = _split_digits(arg)
    if digits is None and arg0.endswith("* 1000000"):
        return "micro-recovery"
    if digits in (None, "0") and arg0.endswith("* 100"):
        return "cents-recovery"
    if digits is None and re.fullmatch(r"[A-Za-z_][\w]*(\.[\w]+)?", arg0):
        return "int-recovery"
    if digits == "2" and re.fullmatch(r"[A-Za-z_][\w]*(\.[\w]+)?", arg0):
        return "raw-2dp-recovery"
    core = arg0
    if core.startswith("100.0 * "):
        core = core[len("100.0 * ") :]
    if core.startswith("CAST(") and "DECIMAL(" in core and digits in ("2", "4", "6"):
        # The exactness argument only holds when the CAST body is the
        # decimal value itself — a DIVISION inside the cast (e32's old
        # decimal/decimal quotient) rounds at the derived scale first
        # and is NOT safe; divisions must sit outside the cast (davg).
        i, depth = len("CAST("), 1
        while depth and i < len(core):
            if core[i] == "(":
                depth += 1
            elif core[i] == ")":
                depth -= 1
            i += 1
        body = core[len("CAST(") : i - 1]
        if "/" not in body:
            return "dsum-publish"
    return None


def test_every_oracle_round_site_is_reviewed_safe():
    offenders = []
    for name, sql in sorted(ORACLES.items()):
        for site in _sites(sql):
            if site in ALLOWLIST or classify(site):
                continue
            offenders.append(f"{name}: {site[:140]}")
    assert not offenders, (
        "unreviewed ROUND site in an oracle — the t09 class reintroduced; "
        "convert to integer micros / floor_scaled, or (after review) add "
        "the exact site to the ALLOWLIST:\n" + "\n".join(offenders)
    )


def test_classifier_rejects_known_bad_forms():
    bad = [
        "ROUND(shared * 1.0 / k_kept, 6)",  # int/int ratio (pre-r10 x16)
        "ROUND(mean_c / 100.0, 6)",  # decimal mean (pre-r10 x23)
        "ROUND(mde_abs, 6)",  # sqrt-bearing float (pre-r10 x38)
        "ROUND(SUM(v) / 3.0, 4)",  # float quotient
        "ROUND(CAST(MAX(cusum) / CAST(MAX(n_days) AS DECIMAL(38,0)) AS DOUBLE), 4)",
        # ^ decimal/decimal quotient (pre-r10 e32): the CAST head alone
        #   must not grant dsum status to a DIVISION inside the cast.
    ]
    for b in bad:
        site = re.sub(r"\s+", " ", b)
        assert site not in ALLOWLIST
        assert classify(site) is None, (b, classify(site))
