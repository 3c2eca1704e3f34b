"""Dataset-level operators: stats, uniqueness, referential, drift, dedup,
similarity search, text analysis — the distributed checks the reference
(a single-value validator) has no counterpart for (SURVEY.md §2.6).

Everything is built from Spark built-ins with partial aggregation,
broadcast-able joins, and no driver-side row loops.
"""

from .consistency import check_invariants
from .drift import chi_square_counts, ks_approx, ks_exact
from .referential import orphan_count, orphans
from .stats import column_profile, null_rates
from .uniqueness import duplicate_keys, duplication_report

__all__ = [
    "column_profile", "null_rates",
    "duplicate_keys", "duplication_report",
    "orphans", "orphan_count",
    "check_invariants",
    "ks_exact", "ks_approx", "chi_square_counts",
]
