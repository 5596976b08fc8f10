"""Query plans — the named-query registry that backs the driver
contract (``__spark_entry__.queries()`` / ``oracle_sql()``)."""
