from .readers import (  # noqa: F401
    TABLES,
    load_table,
    read_csv_table,
    read_orc,
    read_text_lines,
    register_views,
)
