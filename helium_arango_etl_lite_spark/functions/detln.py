"""Deterministic cross-engine natural log as shared SQL expressions.

Why this exists (ADVICE r10, ``llm_zipf_slope``): fixed-pointing
``floor(ln(x) * 1e6 + 0.5)`` is only cross-engine-exact if both engines
produce the bit-identical double for ``ln(x)`` — but DuckDB calls libm
and the JVM calls ``java.lang.Math.log``, neither correctly rounded,
so a 1-ulp divergence near a ``.5`` quantization boundary could flip an
integer coordinate and break a value-hash the repo elsewhere guarantees
by construction (``graph_resource_allocation`` avoids ln entirely for
exactly this reason).

The fix is to stop calling either engine's ``ln`` and instead evaluate
ONE explicit arithmetic pipeline — generated here once and injected
verbatim into BOTH the Spark plan (``F.expr`` per stage) and the DuckDB
oracle SQL (lateral column aliases per stage). The expressions use only
IEEE-754 binary64 ``+ - * /``, ``CASE``, ``FLOOR`` and ``CAST``; those
primitive ops are correctly rounded in every IEEE implementation, the
staged expression tree fixes the evaluation order, and decimal double
literals (``E0`` exponent form, ``repr`` round-trip) parse to the
identical binary64 in both engines — so the result is bit-identical by
construction, not by luck. (Exponent form is load-bearing: bare ``1.0``
parses as DECIMAL in both Spark SQL and DuckDB, and decimal arithmetic
would diverge from double.)

Algorithm: range-reduce ``x = m * 2^k`` with ``m in [1, 2)`` via a
descending 62-arm CASE on integer thresholds (division by a power of
two is exact in binary64; for ``x >= 2^53`` the int→double cast rounds
once, correctly and identically in both engines), then
``ln(m) = 2 * atanh(z)`` with ``z = (m-1)/(m+1) in [0, 1/3]`` summed by
a fixed 17-term Horner polynomial in ``z^2`` (truncation < 2e-18
relative — below double roundoff), plus ``k*ln2`` from a literal table.
The value can differ from a correctly-rounded ln by a few ulp; that is
irrelevant, because BOTH engines compute the SAME few-ulp-off value.

The pipeline is staged through named columns (not one inlined mega-
expression — Horner alone references z² sixteen times, and inlining
would nest the 62-arm CASE exponentially). ``ln_u6_stages`` returns the
ordered ``(column, expression)`` list; ``with_ln_u6`` wires it into a
DataFrame, ``ln_u6_select_sql`` renders the DuckDB SELECT-list form.

Cost: a 62-arm CASE plus ~20 multiply-adds per row — pennies, and
callers apply it to already-reduced tables (top-K ranks, grouped
counts), never to raw corpus rows.
"""

from __future__ import annotations

import math

# Highest exponent needed: inputs are positive BIGINTs, so x < 2^63 and
# k <= 62 covers the full domain.
_MAX_K = 62

# P(u) = sum_{j=0..16} u^j / (2j+1); ln(m) = 2*z*P(z^2). With z <= 1/3
# (m in [1,2)) the first omitted term is u^17/35 <= (1/9)^17/35 ~ 2e-18.
_N_TERMS = 17


def _dlit(v: float) -> str:
    """Render a Python double as a literal BOTH engines parse to the
    identical binary64: repr() round-trips exactly, and the exponent
    marker forces DOUBLE (not DECIMAL) typing in Spark SQL and DuckDB."""
    s = repr(float(v))
    return s if ("e" in s or "E" in s) else s + "E0"


def ln_u6_stages(x: str, out: str) -> list[tuple[str, str]]:
    """Ordered (column_name, sql_expression) stages computing
    ``out = floor(ln(x)*1e6 + 0.5)`` as BIGINT from positive-integer
    expression ``x``. Each stage's expression references only ``x`` and
    earlier stage columns; the final stage is named ``out`` and the
    intermediates are prefixed ``__{out}_`` so callers can drop them.
    The expression STRINGS are the shared artifact: feed them to
    ``F.expr`` on the Spark side and to a lateral-alias SELECT list (or
    chained CTEs) on the DuckDB side and the two engines perform the
    identical IEEE arithmetic.
    """
    p = f"__{out}"
    kln2_arms = " ".join(
        f"WHEN ({x}) >= {1 << k} THEN {_dlit(k * math.log(2.0))}"
        for k in range(_MAX_K, 0, -1)
    )
    p2_arms = " ".join(
        f"WHEN ({x}) >= {1 << k} THEN {_dlit(float(1 << k))}"
        for k in range(_MAX_K, 0, -1)
    )
    poly = _dlit(1.0 / (2 * (_N_TERMS - 1) + 1))
    for j in range(_N_TERMS - 2, -1, -1):
        poly = f"({poly} * {p}_u + {_dlit(1.0 / (2 * j + 1))})"
    return [
        (f"{p}_kln2", f"CASE {kln2_arms} ELSE 0.0E0 END"),
        (f"{p}_p2", f"CASE {p2_arms} ELSE 1.0E0 END"),
        (f"{p}_m", f"CAST(({x}) AS DOUBLE) / {p}_p2"),
        (f"{p}_z", f"({p}_m - 1.0E0) / ({p}_m + 1.0E0)"),
        (f"{p}_u", f"{p}_z * {p}_z"),
        (f"{p}_lnx", f"{p}_kln2 + ((2.0E0 * {p}_z) * {poly})"),
        (
            out,
            f"CAST(FLOOR({p}_lnx * 1000000.0E0 + 0.5E0) AS BIGINT)",
        ),
    ]


def with_ln_u6(df, x: str, out: str):
    """Append column ``out = floor(ln(x)*1e6+0.5)`` (BIGINT) to a Spark
    DataFrame via the shared staged expressions; intermediates dropped."""
    from pyspark.sql import functions as F

    stages = ln_u6_stages(x, out)
    for name, expr in stages:
        df = df.withColumn(name, F.expr(expr))
    return df.drop(*[name for name, _ in stages[:-1]])


def ln_u6_select_items(x: str, out: str) -> str:
    """The staged pipeline as a SELECT-list fragment using lateral
    column aliases (supported by DuckDB and Spark SQL alike): append to
    a projection, then strip the ``__{out}_*`` helper columns in the
    enclosing query."""
    return ", ".join(
        f"{expr} AS {name}" for name, expr in ln_u6_stages(x, out)
    )


__all__ = ["ln_u6_stages", "with_ln_u6", "ln_u6_select_items"]
