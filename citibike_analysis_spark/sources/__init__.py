"""Schema-declared sources and sinks (SURVEY.md §2.1 S1-S7)."""

from citibike_analysis_spark.sources.tables import load_table, register_views

__all__ = ["load_table", "register_views"]
