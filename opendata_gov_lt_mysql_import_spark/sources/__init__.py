"""Sources & sinks (SURVEY.md §2.1 S1-S12)."""

from .parquet import TABLES, load_table, load_tables, register_views  # noqa: F401
from .staging import stage_write, stage_read  # noqa: F401
