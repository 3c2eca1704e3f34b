"""Custom stateful streaming operator: per-key RUNNING validation verdicts
via ``applyInPandasWithState`` (Arrow-batched, GroupState-backed).

Windowed aggregation (streaming/validate.py) answers "was this window
clean?"; this operator answers "is this SOURCE healthy so far?" — a
cumulative per-key violation-rate monitor that survives across
micro-batches and emits a row whenever a key's verdict state changes or
its counts advance.  This is the ``applyInPandasWithState`` shape Spark
prescribes for custom stateful logic that windowed aggs can't express
(cumulative ratios with hysteresis).

State per key is O(1) (three counters) — bounded regardless of stream
length; an optional idle timeout drops keys that stop producing.

The reference engine has no streams (guyskk/validr is synchronous and
in-memory); per-value semantics are preserved: the violation count fed
into the state is computed by the SAME compiled plan as the batch path.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = ("key string, n_rows bigint, n_bad_rows bigint, "
              "n_violations bigint, violation_rate double, verdict string")
STATE_SCHEMA = "n_rows bigint, n_bad_rows bigint, n_violations bigint"


def running_verdicts(plan, sdf: DataFrame, key_col: str,
                     fail_rate: float = 0.05,
                     id_cols: list[str] | None = None,
                     idle_timeout: str | None = None) -> DataFrame:
    """Cumulative per-`key_col` verdict stream.

    Each micro-batch: rows are validated by the compiled `plan` (stateless
    Catalyst pass) and reduced to a 2-column (key, per-row violation
    count) projection — the only data that shuffles to the stateful
    operator.  ``applyInPandasWithState`` then folds the Arrow batches of
    each key into three running counters (a streaming PRE-aggregation is
    not allowed before a stateful operator, so the fold happens inside the
    state function — state is still O(1) per key and batches stream
    through the Python worker without materializing).  verdict = 'fail'
    once the cumulative bad-row rate exceeds `fail_rate`.

    Output mode: update (a row per key per batch it appeared in).
    """
    res = plan.apply(sdf.withColumn("_key", F.col(key_col)),
                     id_cols=["_key", *(id_cols or [])])
    nviol = F.size(F.col("_violations"))
    # cast the key to string here: OUT_SCHEMA declares `key string`, and a
    # numeric key_col would otherwise reach the state function natively
    # typed — update() then yields ints into a string Arrow column and the
    # conversion kills the streaming query
    rows = res.df.select(F.col("_key").cast("string").alias("_key"),
                         nviol.alias("_viol"))

    timeout = (GroupStateTimeout.ProcessingTimeTimeout if idle_timeout
               else GroupStateTimeout.NoTimeout)

    def update(key: Any, pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        (k,) = key
        if state.hasTimedOut:
            state.remove()
            return
        n, bad, viol = state.get if state.exists else (0, 0, 0)
        for pdf in pdfs:
            n += len(pdf)
            bad += int((pdf["_viol"] > 0).sum())
            viol += int(pdf["_viol"].sum())
        state.update((n, bad, viol))
        if idle_timeout:
            state.setTimeoutDuration(idle_timeout)
        rate = (bad / n) if n else 0.0
        yield pd.DataFrame({
            "key": [k], "n_rows": [n], "n_bad_rows": [bad],
            "n_violations": [viol], "violation_rate": [rate],
            "verdict": ["fail" if rate > fail_rate else "pass"],
        })

    return (rows.groupBy("_key")
            .applyInPandasWithState(update, OUT_SCHEMA, STATE_SCHEMA,
                                    "update", timeout))
