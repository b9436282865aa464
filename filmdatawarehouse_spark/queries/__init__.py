from filmdatawarehouse_spark.queries.parity import PARITY_QUERIES, register_views

__all__ = ["PARITY_QUERIES", "register_views"]
