from .io import (
    add_record_id,
    empty_table,
    read_csv,
    read_parquet,
    write_parquet,
)
from .lineage import merge_preserving_source_records, new_lineage

__all__ = [
    "add_record_id",
    "empty_table",
    "read_csv",
    "read_parquet",
    "write_parquet",
    "merge_preserving_source_records",
    "new_lineage",
]
