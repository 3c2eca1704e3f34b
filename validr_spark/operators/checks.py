"""Declarative data-quality check suite — table-level constraints compiled
into ONE aggregation pass.

The row-validation compiler (validr_spark.compiler) answers "is each ROW
well-formed" with per-row violations; this module answers "is the TABLE
acceptable" with per-constraint verdicts: row-count bounds, null-rate
ceilings, min/max/mean/quantile bounds, uniqueness ratios, value-set
containment, regex-match ratios, and arbitrary SQL predicates with a
minimum satisfaction ratio.

Scale design (the 10^12-row shape):

* Every constraint lowers to an algebraic (or sketch) aggregate, and the
  whole suite is ONE ``df.agg(...)`` — a single scan with map-side partial
  aggregation; the shuffle carries one row per task, never data rows.
* Uniqueness defaults to ``approx_count_distinct`` (HLL, mergeable).
  ``exact=True`` uses ``count_distinct`` — Spark plans it as an Expand +
  two-phase agg keyed on the value, which shuffles the distinct keys; fine
  at dimension-column cardinality, wrong for ~10^12 unique ids (use
  operators.uniqueness.duplicate_keys for that).
* Quantiles use the mergeable ``percentile_approx`` sketch by default;
  ``exact=True`` is for small-scale oracle comparison only.

The report is a DataFrame (one row per constraint) so it can be written
next to the manifest and unioned across runs.

Reference parity note: the reference (guyskk/validr) has no table-level
constraint layer — this extends its row semantics to the dataset level the
way the north rule's "per-partition pass/fail verdicts" require; message
style follows the reference's "expect … , but …" convention
(/root/reference/src/validr/_validator_c.pyx:300-340 error strings).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    """One constraint: an aggregate ``metric`` over the table and a closed
    ``[lo, hi]`` acceptance interval (either side may be None)."""

    check_id: str
    column: str | None
    metric: Column = field(compare=False)
    lo: float | None = None
    hi: float | None = None

    # -- factories ---------------------------------------------------------
    @staticmethod
    def row_count(min: int | None = None, max: int | None = None) -> "Check":
        return Check("row_count", None, F.count(F.lit(1)).cast("double"),
                     lo=min, hi=max)

    @staticmethod
    def null_rate(column: str, max: float,
                  empty_is_null: bool = False) -> "Check":
        c = F.col(column)
        is_null = c.isNull()
        if empty_is_null:
            is_null = is_null | (c.cast("string") == "")
        m = F.sum(is_null.cast("long")) / F.count(F.lit(1))
        return Check(f"null_rate({column})", column, m, hi=max)

    @staticmethod
    def min(column: str, ge: float) -> "Check":
        return Check(f"min({column})", column,
                     F.min(F.col(column)).cast("double"), lo=ge)

    @staticmethod
    def max(column: str, le: float) -> "Check":
        return Check(f"max({column})", column,
                     F.max(F.col(column)).cast("double"), hi=le)

    @staticmethod
    def mean(column: str, between: tuple[float, float]) -> "Check":
        return Check(f"mean({column})", column, F.avg(F.col(column)),
                     lo=between[0], hi=between[1])

    @staticmethod
    def stddev(column: str, le: float) -> "Check":
        # population stddev: deterministic and DuckDB-matched (stddev_pop)
        return Check(f"stddev({column})", column,
                     F.stddev_pop(F.col(column)), hi=le)

    @staticmethod
    def quantile(column: str, q: float, between: tuple[float, float],
                 exact: bool = False,
                 relative_error: float = 0.001) -> "Check":
        if exact:
            m = F.expr(f"percentile({column}, {q!r})")
        else:
            m = F.expr(f"percentile_approx({column}, {q!r}, "
                       f"{int(1.0 / relative_error)})").cast("double")
        return Check(f"q{q}({column})", column, m,
                     lo=between[0], hi=between[1])

    @staticmethod
    def unique_ratio(column: str, min: float,
                     exact: bool = False) -> "Check":
        c = F.col(column)
        distinct = (F.count_distinct(c) if exact
                    else F.expr(f"approx_count_distinct({column})"))
        m = distinct / F.sum(c.isNotNull().cast("long"))
        tag = "exact" if exact else "approx"
        return Check(f"unique_ratio({column},{tag})", column, m, lo=min)

    @staticmethod
    def values_in(column: str, allowed: list, min_ratio: float = 1.0) -> "Check":
        c = F.col(column)
        ok = c.isin(list(allowed)) & c.isNotNull()
        m = F.sum(ok.cast("long")) / F.sum(c.isNotNull().cast("long"))
        return Check(f"values_in({column})", column, m, lo=min_ratio)

    @staticmethod
    def matches(column: str, pattern: str, min_ratio: float = 1.0) -> "Check":
        # full-match anchoring, same convention as the rule compiler
        # (rules.py uses \z: Java's \Z still matches BEFORE a final line
        # terminator, so 'abc\n' would count as a full match of 'abc' and
        # this table-gate would disagree with the row validator built
        # from the same pattern)
        c = F.col(column)
        ok = c.rlike(f"\\A(?:{pattern})\\z")
        m = F.sum(ok.cast("long")) / F.sum(c.isNotNull().cast("long"))
        return Check(f"matches({column})", column, m, lo=min_ratio)

    @staticmethod
    def satisfies(predicate_sql: str, min_ratio: float = 1.0,
                  name: str | None = None) -> "Check":
        ok = F.expr(predicate_sql)
        m = F.sum(ok.cast("long")) / F.count(F.lit(1))
        return Check(name or f"satisfies({predicate_sql})", None, m,
                     lo=min_ratio)

    @staticmethod
    def encoding_clean_ratio(column: str, min_ratio: float = 1.0) -> "Check":
        """Fraction of non-null strings free of encoding damage
        (operators/encoding.py classes: replacement char, stray control,
        mojibake, zero-width).  Same codegen regex pass, folded into the
        suite's single scan."""
        from validr_spark.operators.encoding import encoding_counts

        c = F.col(column)
        e = encoding_counts(c)
        total = None
        for fld in e["replacement"], e["control"], e["mojibake"], e["zero_width"]:
            total = fld if total is None else total + fld
        clean = c.isNotNull() & (total == 0)
        m = F.sum(clean.cast("long")) / F.sum(c.isNotNull().cast("long"))
        return Check(f"encoding_clean_ratio({column})", column, m,
                     lo=min_ratio)

    @staticmethod
    def tokens_match(merges: list[tuple[str, str]],
                     text_col: str = "text",
                     tokens_col: str = "tokens",
                     vocab: dict[str, int] | None = None,
                     unk_id: int = -1,
                     min_ratio: float = 1.0) -> "Check":
        """Fraction of rows whose ``tokens_col`` equals ``BPE(text)``
        under the trained merge table (operators/bpe.py) — the north
        rule's per-row token-array-equality invariant as a suite gate,
        the table-level complement of
        ``bpe.tokens_match_tokenizer``'s per-row violation listing.
        The recompute is ONE Arrow-batched pandas UDF column folded
        into the suite's single scan (Spark lifts it into a projection
        before the aggregate); both-NULL rows count as matching — no
        evidence of drift."""
        from pyspark.sql import SparkSession
        from validr_spark.operators.bpe import _tokens_expr

        spark = SparkSession.getActiveSession()
        if spark is None:                     # pragma: no cover
            raise RuntimeError("tokens_match needs an active "
                               "SparkSession to broadcast the merge "
                               "table")
        expected = _tokens_expr(spark, merges, text_col, vocab, unk_id)
        ok = F.col(tokens_col).eqNullSafe(expected)
        m = F.sum(ok.cast("long")) / F.count(F.lit(1))
        return Check(f"tokens_match({tokens_col})", tokens_col, m,
                     lo=min_ratio)

    @staticmethod
    def array_finite_ratio(column: str, min_ratio: float = 1.0) -> "Check":
        """Fraction of non-null float-array rows containing no NaN/±Inf
        and no NULL elements (operators/embedding.py hygiene semantics:
        `array_contains` against the special-value literals, NULL-element
        via the array_compact size drop).  Algebraic — one scan."""
        c = F.col(column)
        nan = F.lit(float("nan"))
        pinf = F.lit(float("inf"))
        ninf = F.lit(float("-inf"))
        bad = (F.coalesce(F.array_contains(c, nan), F.lit(False))
               | F.coalesce(F.array_contains(c, pinf), F.lit(False))
               | F.coalesce(F.array_contains(c, ninf), F.lit(False))
               | (F.size(F.array_compact(c)) < F.size(c)))
        ok = c.isNotNull() & ~bad
        m = F.sum(ok.cast("long")) / F.sum(c.isNotNull().cast("long"))
        return Check(f"array_finite_ratio({column})", column, m,
                     lo=min_ratio)


class CheckSuite:
    """A named bag of Checks evaluated in one scan.

    >>> suite = CheckSuite("documents_gate", [
    ...     Check.row_count(min=100),
    ...     Check.null_rate("text", max=0.05, empty_is_null=True),
    ...     Check.unique_ratio("doc_id", min=0.99),
    ... ])
    >>> report = suite.run(df)          # DataFrame, one row per check
    >>> suite.verdict(report)           # True iff every check passed
    """

    def __init__(self, name: str, checks: list[Check]):
        ids = [c.check_id for c in checks]
        if len(set(ids)) != len(ids):
            dup = sorted({i for i in ids if ids.count(i) > 1})
            raise ValueError(f"duplicate check_id(s): {dup}; pass a unique "
                             "name= to satisfies() or drop the duplicate")
        self.name = name
        self.checks = list(checks)

    def run(self, df: DataFrame,
            round_digits: int | None = 6) -> DataFrame:
        """One aggregation pass → (check_id, column, observed, lo, hi,
        passed, message).

        ``passed`` gates on the RAW metric; ``round_digits`` shapes only
        the reported ``observed``/``message`` columns (``None`` = raw).
        A rounded gate would let a value up to half an ulp-of-the-last-
        digit past a bound still pass — the same hole ``drift_gate``
        closes by gating raw.
        """
        aggs = [c.metric.cast("double").alias(f"m{i}")
                for i, c in enumerate(self.checks)]
        row = df.agg(*aggs)
        out = []
        for i, c in enumerate(self.checks):
            v = F.col(f"m{i}")
            v_obs = (F.round(v, round_digits)
                     if round_digits is not None else v)
            passed = F.lit(True)
            if c.lo is not None:
                passed = passed & v.isNotNull() & (v >= float(c.lo))
            if c.hi is not None:
                passed = passed & v.isNotNull() & (v <= float(c.hi))
            lo_s = "-inf" if c.lo is None else repr(float(c.lo))
            hi_s = "+inf" if c.hi is None else repr(float(c.hi))
            bound = f"[{lo_s}, {hi_s}]"
            msg = F.when(passed, F.lit(None).cast("string")).otherwise(
                F.concat(F.lit(f"expect {c.check_id} in {bound}, but "),
                         F.coalesce(v_obs.cast("string"), F.lit("null"))))
            out.append(F.struct(
                F.lit(c.check_id).alias("check_id"),
                F.lit(c.column).cast("string").alias("column"),
                v_obs.alias("observed"),
                F.lit(c.lo).cast("double").alias("lo"),
                F.lit(c.hi).cast("double").alias("hi"),
                passed.alias("passed"),
                msg.alias("message"),
            ))
        return (row.select(F.explode(F.array(*out)).alias("c"))
                .select("c.*"))

    @staticmethod
    def verdict(report: DataFrame) -> bool:
        """Collects ONE boolean (aggregated, never row data)."""
        return bool(report.agg(
            F.min(F.col("passed").cast("int"))).first()[0])


def drift_gate(df_ref: DataFrame, df_new: DataFrame,
               numeric_cols: list[str] | None = None,
               cat_cols: list[str] | None = None,
               max_psi: float = 0.25, max_jsd: float = 0.1,
               max_ks: float | None = None,
               bins: int = 10, round_digits: int = 6) -> DataFrame:
    """Distribution-drift constraints as CI-gate rows — the two-table
    companion of :class:`CheckSuite` (whose single-agg-pass design is
    one-table by construction): per numeric column a PSI bound (and
    optionally KS), per categorical column a JSD bound, emitted in the
    SAME report schema (check_id, column, observed, lo, hi, passed,
    message) so the rows union with a CheckSuite report and
    :meth:`CheckSuite.verdict` gates the combined table.

    A NULL metric (empty new side, no reference range) FAILS the gate
    with an explicit "no data" message — a monitor that silently passes
    when the data vanished is worse than none.

    Cost: the underlying drift operators' aggregates per column
    (sketch-based at scale); nothing row-shaped is collected.
    """
    from .drift import drift_report
    # round_digits=None: the gate needs RAW metrics — drift_report's
    # display rounding would re-introduce the rounded-gate hole.
    rep = drift_report(df_ref, df_new, numeric_cols=numeric_cols,
                       cat_cols=cat_cols, bins=bins, round_digits=None)
    rows = []
    gates = [("psi", "psi", max_psi), ("jsd", "jsd", max_jsd)]
    if max_ks is not None:
        gates.append(("ks", "ks", max_ks))
    for check_id, metric_col, hi in gates:
        # Gate on the RAW metric: rounding first would let a value up to
        # 5e-7 over the bound slip through a 6-digit round (ADVICE.md
        # round-2 finding).  round_digits only shapes the REPORTED
        # observed/message columns.
        raw = F.col(metric_col).cast("double")
        # Display rounding must never contradict the verdict: a metric
        # 2e-9 over the bound rounds to exactly the bound, and a failing
        # row whose observed equals its own hi reads as a harness bug.
        # Report the raw value whenever rounding would cross the bound.
        rounded = F.round(raw, round_digits)
        v = F.when((raw > float(hi)) & (rounded <= float(hi)), raw) \
             .otherwise(rounded)
        applicable = ((F.col("kind") == "numeric")
                      if metric_col in ("psi", "ks")
                      else (F.col("kind") == "categorical"))
        passed = raw.isNotNull() & (raw <= float(hi))
        msg = (F.when(passed, F.lit(None).cast("string"))
               .when(raw.isNull(),
                     F.lit(f"expect {check_id} <= {hi!r}, but no data"))
               .otherwise(F.concat(
                   F.lit(f"expect {check_id} <= {hi!r}, but "),
                   v.cast("string"))))
        rows.append(rep.filter(applicable).select(
            F.lit(f"drift_{check_id}").alias("check_id"),
            F.col("column").cast("string").alias("column"),
            v.alias("observed"),
            F.lit(None).cast("double").alias("lo"),
            F.lit(float(hi)).alias("hi"),
            passed.alias("passed"),
            msg.alias("message")))
    from functools import reduce as _reduce
    return _reduce(DataFrame.unionByName, rows).orderBy("check_id",
                                                        "column")
