from gmall_flink_yb_spark.sources.readers import (  # noqa: F401
    load_tables,
    parse_log_stream,
    read_table,
)
from gmall_flink_yb_spark.sources.cdc import (  # noqa: F401
    debezium_to_envelope,
    parse_cdc_stream,
)
