from filmdatawarehouse_spark.io.sources import (
    literal_rows,
    read_jdbc_table,
    read_table,
    read_tables,
)
from filmdatawarehouse_spark.io.sinks import write_fact, write_table

__all__ = [
    "read_table",
    "read_tables",
    "read_jdbc_table",
    "literal_rows",
    "write_table",
    "write_fact",
]
