from arrow_spark.streaming.joins import interval_join  # noqa: F401
from arrow_spark.streaming.windows import (  # noqa: F401
    rank_topk,
    session_window_agg,
    sliding_window_agg,
    stream_from_directory,
    tumbling_window_agg,
    windowed_topk,
)
from arrow_spark.streaming.sink import (  # noqa: F401
    committed_epochs,
    idempotent_sink,
    read_committed,
    write_epoch,
)
from arrow_spark.streaming.drift import (  # noqa: F401
    mix_tv_from_counts,
    windowed_drift,
)
