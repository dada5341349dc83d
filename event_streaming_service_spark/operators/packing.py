"""Sequence packing for training-data pipelines (SURVEY.md
section 2.12 extension surface): assign documents to fixed
token-budget bins (context windows) so a trainer reads dense, padded
batches instead of one short doc per window.

Semantics — deterministic greedy sequential packing: within a packing
shard, walk docs in doc_id order accumulating token counts; a doc that
would overflow the current bin starts a new one. A doc larger than the
whole budget gets a bin of its own (flagged `oversize` — downstream
truncation/splitting policy is the trainer's call). The rule is
sequential by construction (bin boundaries depend on every prior doc),
so it cannot be a window expression; it IS embarrassingly parallel
ACROSS shards.

Scale: the corpus shuffles once on the shard key; each shard packs
independently inside one `applyInPandas` group (Arrow-batched, a
single linear pass over a sorted column — microseconds per thousand
docs). Shard count is the parallelism knob: production uses
hash(doc_id) % n_shards striping (any shard population imbalance is
bounded by the hash), and packing quality loses nothing because bins
never span shards by design. The greedy walk per shard carries only
(current bin, fill) — O(1) state, any shard size streams.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from event_streaming_service_spark.operators.dedup import portable_token_hash
from event_streaming_service_spark.operators.text import tokens


def whitespace_token_count(text: Column) -> Column:
    return F.size(tokens(text)).cast("bigint")


def shard_of(id_col: Column, n_shards: int) -> Column:
    """Content-hash shard assignment: works for string ids and is
    pattern-free (pmod(doc_id, n) correlates with any id-assignment
    scheme — e.g. ids striped by source would pile one source onto one
    shard). The 28-bit md5 prefix hash keeps it expressible in the
    DuckDB oracle, unlike xxhash64."""
    return F.pmod(portable_token_hash(id_col.cast("string")),
                  F.lit(n_shards)).cast("int")


def pack_sequences(docs: DataFrame, budget: int, n_shards: int = 8,
                   id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """One row per input doc: (doc_id, shard, n_tokens, bin_id,
    oversize). (shard, bin_id) identifies the packed context window;
    bin_ids are dense 0..k within each shard in doc_id order.
    """
    import pandas as pd

    counted = docs.select(
        F.col(id_col).alias("doc_id"),
        shard_of(F.col(id_col), n_shards).alias("shard"),
        whitespace_token_count(F.col(text_col)).alias("n_tokens"))

    def pack(pdf):
        # self-contained closure (captures only `budget` and the pandas
        # module) — safe to pickle by value for any executor topology
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        bins, fill, cur = [], 0, 0
        for n in pdf["n_tokens"]:
            if fill > 0 and fill + n > budget:
                cur += 1
                fill = 0
            bins.append(cur)
            fill += n
        out = pdf[["doc_id", "shard", "n_tokens"]].copy()
        out["bin_id"] = pd.Series(bins, dtype="int64")
        out["oversize"] = (out["n_tokens"] > budget)
        return out

    return counted.groupBy("shard").applyInPandas(
        pack,
        "doc_id long, shard int, n_tokens long, bin_id long, oversize boolean")
