"""Query definitions, grouped by SURVEY.md section 2 family.

Importing this package registers every query into queries.REGISTRY.
"""

from event_streaming_service_spark.query_defs import (  # noqa: F401
    agg_extra_queries,
    analytics_queries,
    audio_queries,
    catalog_queries,
    collocation_queries,
    dedup_queries,
    envelope_queries,
    governance_queries,
    join_queries,
    linkage_queries,
    multimodal_queries,
    packing_queries,
    pii_queries,
    pipeline_queries,
    quantile_queries,
    replay_queries,
    routing_queries,
    sampling_queries,
    scale_queries,
    scalar_queries,
    sketch_queries,
    similarity_queries,
    stats_queries,
    streaming_queries,
    surface_queries,
    surface_queries3,
    text_queries,
    tpch_complete_queries,
    tpch_extra_queries,
    tpch_queries,
    window_frame_queries,
    window_queries,
)
