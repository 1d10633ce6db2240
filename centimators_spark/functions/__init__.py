from centimators_spark.functions.horizontal import (
    mean_horizontal,
    var_horizontal,
    std_horizontal,
    skew_horizontal,
    kurtosis_horizontal,
    range_horizontal,
    min_horizontal,
    max_horizontal,
    coefficient_of_variation_horizontal,
)

__all__ = [
    "mean_horizontal",
    "var_horizontal",
    "std_horizontal",
    "skew_horizontal",
    "kurtosis_horizontal",
    "range_horizontal",
    "min_horizontal",
    "max_horizontal",
    "coefficient_of_variation_horizontal",
]
