from tickerlake_spark.functions.core import (
    epoch_ms_to_date,
    floor_div_long,
    product,
    rolling_mean_strict,
    true_range,
)

__all__ = [
    "epoch_ms_to_date",
    "floor_div_long",
    "product",
    "rolling_mean_strict",
    "true_range",
]
