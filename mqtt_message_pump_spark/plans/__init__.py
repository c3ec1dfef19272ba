"""Batch query registry: every operator from SURVEY.md SS2 as a
``(spark, sf_dir) -> DataFrame`` callable plus its DuckDB oracle SQL twin.

Importing this package registers all queries.
"""

from mqtt_message_pump_spark.plans.registry import ORACLES, QUERIES, query, table

# Import for registration side effects.
from mqtt_message_pump_spark.plans import (  # noqa: E402,F401
    analytic,
    core,
    corpus,
    llm,
    metrics,
    multimodal,
    relational,
    star,
)

__all__ = ["QUERIES", "ORACLES", "query", "table"]
