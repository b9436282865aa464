from filmdatawarehouse_spark.operators.cleaning import clean, clean_with_stats
from filmdatawarehouse_spark.operators.dates import (
    date_dimension,
    with_date_id,
    with_month_key,
)

__all__ = [
    "clean",
    "clean_with_stats",
    "date_dimension",
    "with_date_id",
    "with_month_key",
]
