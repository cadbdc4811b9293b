from data_warehouse_data_mining_spark.sinks.writers import (
    compact_files,
    write_bucketed_table,
    write_partitioned,
    write_sorted_for_skipping,
    write_with_bloom_filters,
    write_zordered,
)

__all__ = [
    "compact_files",
    "write_bucketed_table",
    "write_partitioned",
    "write_sorted_for_skipping",
    "write_with_bloom_filters",
    "write_zordered",
]
