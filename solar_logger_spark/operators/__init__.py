from solar_logger_spark.operators.window_agg import aggregate_window, AGG_FNS
from solar_logger_spark.operators.asof import latest_per_key, status_gate, asof_join

__all__ = [
    "aggregate_window",
    "AGG_FNS",
    "latest_per_key",
    "status_gate",
    "asof_join",
]
