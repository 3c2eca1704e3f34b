"""Table sources and sinks (parquet now, Iceberg when the jar is present)."""

from .tables import (TableSink, TableSource, iceberg_available, read_table,
                     validr_read_schema, write_bucketed, write_table)

__all__ = ["TableSource", "TableSink", "read_table", "write_table",
           "iceberg_available", "validr_read_schema", "write_bucketed"]
