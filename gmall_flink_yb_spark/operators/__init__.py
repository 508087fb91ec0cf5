from gmall_flink_yb_spark.operators.log_split import split_log_stream  # noqa: F401
from gmall_flink_yb_spark.operators.visitor import (  # noqa: F401
    correct_is_new_batch,
    unique_visitors_batch,
)
from gmall_flink_yb_spark.operators.bounce import (  # noqa: F401
    detect_bounce_batch,
    flag_bounce_batch,
)
from gmall_flink_yb_spark.operators.order_wide import (  # noqa: F401
    enrich_dims,
    interval_join,
    parse_order_facts,
)
from gmall_flink_yb_spark.operators.asof import asof_join  # noqa: F401
from gmall_flink_yb_spark.operators.routing import route_cdc  # noqa: F401
from gmall_flink_yb_spark.operators.windows import tumbling_agg  # noqa: F401
from gmall_flink_yb_spark.operators.keywords import keyword_counts  # noqa: F401
