from .jobs import (  # noqa: F401
    dedup_stream,
    interval_join_stream,
    read_events_stream,
    read_table_stream,
    run_available_now,
    sessionized_stream,
    sliding_counts_stream,
    state_store_confs,
    tumbling_counts_stream,
)
from .stateful import running_user_totals  # noqa: F401
