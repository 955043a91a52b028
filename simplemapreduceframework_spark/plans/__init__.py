from .explain import (  # noqa: F401
    explain_str,
    has_broadcast_hash_join,
    n_exchanges,
    pushed_filters,
    read_schema_columns,
)
