"""Oracle canonicalization-boundary guard (round-4, VERDICT r3 ask #7).

The r2->r3 lesson: the local harness renders DuckDB results via str(),
which is blind to HUGEINT (DuckDB's untyped sum() output) vs BIGINT —
but the driver canonicalizes through pandas/pyarrow, where HUGEINT
stringifies differently and the value hash diverges while rows/schema
still match.  That exact signature cost five queries two rounds of
hash-FAILs (nfc_audit, clean_text, position_stats, vocab_coverage,
value_variants — all raw sum() columns).

This test runs EVERY oracle_sql() twin through DuckDB at sf0.001 and
asserts the result schema stays inside the portable scalar subset that
renders identically through str(), pandas, and pyarrow.  Any new oracle
with an exotic output type (HUGEINT, DECIMAL, or a nested type — lists
and maps crash the driver's canonicalizer outright) fails CI here, not
the next driver round.

DuckDB-only: no SparkSession, runs in seconds.
"""
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

SF = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Types that render identically through str(), pandas, and pyarrow —
# keep in sync with tools/check_oracles.py PORTABLE_TYPES.
PORTABLE_TYPES = {"BIGINT", "INTEGER", "SMALLINT", "TINYINT", "DOUBLE",
                  "FLOAT", "VARCHAR", "BOOLEAN", "DATE", "TIMESTAMP"}


def _oracles():
    import __spark_entry__ as entrymod

    return sorted(entrymod.oracle_sql().items())


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


@pytest.mark.parametrize("name,sql", _oracles(),
                         ids=[n for n, _ in _oracles()])
def test_oracle_output_types_are_portable(con, name, sql):
    rel = con.sql(sql)
    bad = [(c, str(t).upper()) for c, t in zip(rel.columns, rel.types)
           if str(t).upper() not in PORTABLE_TYPES]
    assert not bad, (
        f"oracle '{name}' emits non-portable output types {bad}: the "
        f"driver's pandas/pyarrow canonicalizer hashes these differently "
        f"than the Spark side even when values are equal — cast "
        f"aggregate-derived columns to ::BIGINT / ::DOUBLE")


def test_portable_set_matches_checker():
    """The pytest guard and tools/check_oracles.py must agree, or one
    gate rots silently."""
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(__file__)), "tools"))
    import check_oracles

    assert check_oracles.PORTABLE_TYPES == PORTABLE_TYPES
