"""Assembles the full named-query registry by importing every
registration module (import order = SURVEY.md §2 section order)."""

from __future__ import annotations

import movie_rankings_spark.plans.flagship_queries  # noqa: F401
import movie_rankings_spark.plans.llm_queries  # noqa: F401
import movie_rankings_spark.plans.relational_ext_queries  # noqa: F401
import movie_rankings_spark.plans.relational_queries  # noqa: F401
import movie_rankings_spark.plans.streaming_queries  # noqa: F401
import movie_rankings_spark.plans.tpch_wide_queries  # noqa: F401
from movie_rankings_spark.plans.registry import REGISTRY

QUERIES = REGISTRY.queries
ORACLES = REGISTRY.oracles
