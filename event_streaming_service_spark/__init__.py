"""PySpark-native analytics engine with the query and data-processing
capabilities of Whirlwind-Technologies/event-streaming-service.

The reference (read-only snapshot at /root/reference) is a Java/Spring
Kafka event-pipeline microservice: publish -> route/partition -> consume
(validate, dedup, retry, DLQ) -> replay -> monitor (lag, statistics,
percentiles). This package re-expresses those semantics Spark-first:
declarative DataFrame/SQL plans optimized by Catalyst, Structured
Streaming for the streaming path, and Arrow-batched Pandas UDFs only
where built-ins genuinely cannot express the semantics.

Layout (mirrors SURVEY.md section 7):
    session          tuned SparkSession builder
    sources.tables   fixture loading + derived event coordinates
    sources.topics   topic-as-table catalog ops (S8-S10)
    operators.routing    partition-key strategies R1-R11
    operators.pipeline   validate/dedup/DLQ consume semantics P1-P4, D1-D2, S3
    operators.replay     time/offset-range replay scans S5-S7
    operators.stats      lag/statistics aggregations A1-A11, O1-O4
    operators.joins      join family J1-J5 + as-of/range generalization
    operators.windows    tumbling/sliding/session batch analogues W8
    operators.dedup      exact + MinHash/SimHash/Jaccard near-dup
    operators.similarity cosine top-k + LSH ANN over embeddings
    operators.text       language-ID, quality, tokens, fingerprints
    operators.multimodal binary-column plumbing (decode stubbed)
    functions.scalars    scalar function inventory (SURVEY section 2.9)
    streaming.pipeline   Structured Streaming wrappers W1-W9
    registry             versioned schema catalog (SURVEY section 1.3)
    queries              central QuerySpec registry -> __spark_entry__
"""

__version__ = "0.1.0"
