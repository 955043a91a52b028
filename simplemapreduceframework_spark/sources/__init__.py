from .readers import TABLES, load_table, read_csv_table, read_text_lines, register_views  # noqa: F401
