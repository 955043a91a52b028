from .readers import (  # noqa: F401
    TABLES,
    load_table,
    read_csv_table,
    read_json_table,
    read_orc,
    read_parquet_evolving,
    read_text_lines,
    register_views,
)
