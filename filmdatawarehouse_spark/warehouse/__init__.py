from filmdatawarehouse_spark.warehouse.jobs import (
    build_dim_date,
    build_dim_film,
    build_dim_rental,
    build_dim_staff,
    build_dim_store,
    build_fact_daily_inventory,
    build_fact_monthly_payment,
)

__all__ = [
    "build_dim_staff",
    "build_dim_film",
    "build_dim_store",
    "build_dim_date",
    "build_dim_rental",
    "build_fact_daily_inventory",
    "build_fact_monthly_payment",
]
