"""Query definitions, grouped by SURVEY.md section 2 family.

Importing this package registers every query into queries.REGISTRY.
"""

from event_streaming_service_spark.query_defs import stats_queries  # noqa: F401
