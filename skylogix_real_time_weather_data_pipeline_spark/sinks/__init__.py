from .layout import (  # noqa: F401
    compact_parquet,
    verify_partition_pruning,
    write_partitioned_sorted,
    write_zordered,
    zorder_key,
)
from .writers import (  # noqa: F401
    write_csv_report,
    write_jdbc,
    write_json_array,
    write_json_records,
    write_parquet,
    write_sqlite,
)
