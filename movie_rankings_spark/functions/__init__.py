"""Scalar expression library — pure ``pyspark.sql.functions`` compositions.

Everything here stays JVM-side (whole-stage codegen); no Python UDFs.
"""

from movie_rankings_spark.functions.normalize import (  # noqa: F401
    ALIAS_OVERRIDES,
    apply_alias_overrides,
    coerce_rank,
    normalize_title,
    strip_year_suffix,
)
