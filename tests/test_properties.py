"""Property-based tests (hypothesis): operator invariants over
adversarial inputs — empty strings, unicode, extreme values — one
generated batch per property to keep Spark round trips bounded."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from event_streaming_service_spark.operators import dedup, pipeline, routing
from event_streaming_service_spark.operators.pipeline import dedup_earliest

_SETTINGS = dict(max_examples=10, deadline=None,
                 suppress_health_check=[HealthCheck.function_scoped_fixture])

keys = st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd", "Po")),
    min_size=0, max_size=24)


@settings(**_SETTINGS)
@given(st.lists(st.tuples(keys, keys), min_size=1, max_size=30))
def test_routing_partition_total_and_stable(spark, rows):
    df = spark.createDataFrame(rows, "tenant_id string, user_key string")
    out = df.select(
        routing.tenant_based().alias("k"),
        routing.partition_for(routing.tenant_based(), 6).alias("p"),
        routing.partition_for(routing.tenant_based(), 6).alias("p2"))
    for r in out.collect():
        assert 0 <= r.p < 6          # total: every key gets a partition
        assert r.p == r.p2           # stable: same key -> same partition
        assert r.k != ""             # fallback guarantees non-empty key


@settings(**_SETTINGS)
@given(st.lists(st.integers(min_value=0, max_value=20), min_size=1, max_size=20))
def test_backoff_monotone_and_capped(spark, retries):
    df = spark.createDataFrame([(n,) for n in retries], "n int")
    got = sorted((r.n, r.b) for r in df.select(
        "n", pipeline.backoff_ms(F.col("n")).alias("b")).collect())
    for (n1, b1), (n2, b2) in zip(got, got[1:]):
        assert b1 <= b2              # monotone in retry count
    assert all(500.0 <= b <= 60000.0 for _, b in got)  # capped


@settings(**_SETTINGS)
@given(st.lists(st.tuples(st.integers(0, 5), st.integers(0, 1000)),
                min_size=1, max_size=40))
def test_dedup_earliest_idempotent(spark, rows):
    df = spark.createDataFrame(
        [(k, v, i) for i, (k, v) in enumerate(rows)],
        "k long, v long, uid long")
    once = dedup_earliest(df, ["k"], ["v", "uid"])
    twice = dedup_earliest(once, ["k"], ["v", "uid"])
    a = sorted(map(tuple, once.collect()))
    b = sorted(map(tuple, twice.collect()))
    assert a == b                   # idempotent
    assert len(a) == len({k for k, _ in rows})  # one winner per key


@settings(**_SETTINGS)
@given(st.lists(st.text(alphabet="ab ", min_size=0, max_size=40),
                min_size=2, max_size=10))
def test_jaccard_bounds_and_self_similarity(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    pairs = dedup.jaccard_pairs(df, 0.0).collect()
    for p in pairs:
        assert 0.0 <= p.jaccard <= 1.0
        assert p.doc_a < p.doc_b     # canonical pair orientation
        assert p.inter <= min(p.size_a, p.size_b)


# -- protobuf wire encoding (sources/proto_wire.py) --

from event_streaming_service_spark.sources import proto_wire  # noqa: E402
from tests.test_protobuf_bridge import _read_fields  # noqa: E402

_META = st.fixed_dictionaries({
    "event_id": st.text(min_size=0, max_size=20),
    "correlation_id": st.text(min_size=0, max_size=20),
    "source_service": st.text(min_size=0, max_size=20),
    "version": st.integers(0, 2**31 - 1),
    "tenant_id": st.text(min_size=0, max_size=20),
    "user_id": st.text(min_size=0, max_size=20),
    "priority": st.integers(0, 4),
    "retry_count": st.integers(0, 100),
})


@settings(max_examples=50, deadline=None)
@given(_META)
def test_proto_wire_roundtrip(meta):
    """Encode -> independent wire reader recovers exactly the
    non-default fields (proto3 canonical form omits defaults)."""
    buf = proto_wire.encode_event_metadata(meta)
    fields = _read_fields(buf)
    by_number = {num: (name, ftype)
                 for name, num, ftype in proto_wire.EVENT_METADATA_FIELDS}
    seen = set()
    for num, raw in fields.items():
        name, ftype = by_number[num]
        seen.add(name)
        if ftype == proto_wire.TYPE_STRING:
            assert raw.decode("utf-8") == meta[name]
        else:
            assert raw == meta[name]
    for name, num, ftype in proto_wire.EVENT_METADATA_FIELDS:
        if name not in seen:  # omitted => was a proto3 default
            assert not meta[name]


@settings(max_examples=20, deadline=None)
@given(st.integers(0, 2**63 - 1))
def test_proto_varint_roundtrip(n):
    buf = proto_wire._varint(n)
    # independent decode
    val = shift = 0
    for b in buf:
        val |= (b & 0x7F) << shift
        shift += 7
    assert (b & 0x80) == 0 and val == n


@settings(**_SETTINGS)
@given(st.fixed_dictionaries({
    "event_id": keys, "correlation_id": keys, "source_service": keys,
    "version": st.integers(min_value=0, max_value=2**31 - 1),
    "tenant_id": keys, "user_id": keys,
    "priority": st.integers(min_value=0, max_value=10),
    "retry_count": st.integers(min_value=0, max_value=1000)}))
def test_proto_wire_roundtrip_property(meta):
    """encode -> decode is the identity for any field values, up to
    proto3 default semantics (no Spark round trip — pure wire format)."""
    from event_streaming_service_spark.sources import proto_wire

    wire = proto_wire.encode_event_metadata(meta)
    assert proto_wire.decode_event_metadata(wire) == meta


@settings(**_SETTINGS)
@given(st.lists(st.tuples(st.integers(0, 3),
                          st.integers(0, 10_000),
                          st.floats(min_value=-100, max_value=100,
                                    allow_nan=False)),
                min_size=2, max_size=40))
def test_twa_bounded_by_min_max_and_even_spacing_is_mean(spark, rows):
    """TWA lies within [min, max] of the key's values; for EVENLY
    spaced observations it equals the plain mean of all but the last
    value (each holds exactly one step)."""
    from datetime import datetime, timedelta

    from event_streaming_service_spark.operators.windows import (
        time_weighted_avg,
    )
    base = datetime(2024, 1, 1)
    data = [(i, k, base + timedelta(minutes=10 * s), v)
            for i, (k, s, v) in enumerate(rows)]
    df = spark.createDataFrame(
        data, "event_id bigint, user_id bigint, ts timestamp, value double")
    out = time_weighted_avg(df, "user_id", "ts", "value",
                            order_tiebreak="event_id").collect()
    by_key = {}
    for _, k, ts, v in data:
        by_key.setdefault(k, []).append((ts, v))
    for r in out:
        vals = [v for _, v in by_key[r["user_id"]]]
        if r["twa_value"] is not None:
            assert min(vals) - 1e-6 <= r["twa_value"] <= max(vals) + 1e-6

    # even spacing: distinct steps 0..n-1 for one key
    evenly = [(i, 9, base + timedelta(hours=i), float(v))
              for i, v in enumerate([3.0, 7.5, -2.25, 10.0])]
    df2 = spark.createDataFrame(
        evenly, "event_id bigint, user_id bigint, ts timestamp, value double")
    row = time_weighted_avg(df2, "user_id", "ts", "value",
                            order_tiebreak="event_id").first()
    assert abs(row["twa_value"] - (3.0 + 7.5 - 2.25) / 3) < 1e-6


@settings(**_SETTINGS)
@given(st.lists(st.tuples(st.integers(0, 2),
                          st.integers(0, 500),
                          st.integers(0, 500)),
                min_size=2, max_size=40))
def test_pearson_corr_bounds_and_perfect_line(spark, rows):
    """|r| <= 1 always; r == 1 exactly for y = 2x + 5."""
    from event_streaming_service_spark.operators.analytics import (
        pearson_corr,
    )
    df = spark.createDataFrame(
        [(g, float(x), float(y)) for g, x, y in rows],
        "g bigint, x double, y double")
    for r in pearson_corr(df, "x", "y", group_cols=["g"]).collect():
        if r["pearson_r"] is not None:
            assert -1.0 <= r["pearson_r"] <= 1.0

    line = spark.createDataFrame(
        [(0, float(x), 2.0 * x + 5) for x in range(5)],
        "g bigint, x double, y double")
    row = pearson_corr(line, "x", "y", group_cols=["g"]).first()
    assert row["pearson_r"] == 1.0


@settings(**_SETTINGS)
@given(st.lists(st.tuples(st.integers(0, 30), st.integers(0, 30)),
                min_size=1, max_size=25))
def test_skyline_matches_brute_force_property(spark, pts):
    """Frontier == the literal dominance definition, on arbitrary
    point multisets (coincident points, degenerate ranges included)."""
    from event_streaming_service_spark.operators.skyline import (
        pareto_frontier,
    )
    df = spark.createDataFrame(pts, "p bigint, q bigint")
    got = sorted((r["p"], r["q"]) for r in
                 pareto_frontier(df, "p", "q", n_buckets=4).collect())
    want = sorted({
        a for a in pts
        if not any(b[0] <= a[0] and b[1] >= a[1]
                   and (b[0] < a[0] or b[1] > a[1]) for b in pts)})
    assert got == want


@settings(**_SETTINGS)
@given(st.lists(st.tuples(st.integers(0, 8), st.integers(0, 8)),
                min_size=1, max_size=20))
def test_pagerank_mass_bounds_and_regular_stationarity(spark, raw):
    """Every node's rank stays within [teleport, teleport + total
    damped mass]; symmetric edges keep 1-regular graphs stationary."""
    from event_streaming_service_spark.operators.graph import (
        INIT_NANO, TELEPORT_NANO, pagerank,
    )
    edges = [(f"n{a}", f"n{b}") for a, b in raw if a != b]
    if not edges:
        edges = [("n0", "n1")]
    sym = edges + [(b, a) for a, b in edges]
    df = spark.createDataFrame(sym, "src string, dst string")
    ranks = pagerank(df, iterations=3).collect()
    n = len(ranks)
    total_cap = n * INIT_NANO
    for r in ranks:
        assert r["rank_nano"] >= TELEPORT_NANO
        assert r["rank_nano"] <= TELEPORT_NANO + total_cap


@settings(**_SETTINGS)
@given(st.lists(st.tuples(st.integers(0, 8), st.integers(0, 8)),
                min_size=1, max_size=20))
def test_pagerank_decimal_width_matches_bigint_path(spark, raw):
    """decimal=True (the corpus-scale accumulator width, VERDICT r4
    item #4) must be value-identical to the default bigint path
    wherever both are in range, and obey the same mass bounds."""
    from event_streaming_service_spark.operators.graph import (
        INIT_NANO, TELEPORT_NANO, pagerank,
    )
    edges = [(f"n{a}", f"n{b}") for a, b in raw if a != b]
    if not edges:
        edges = [("n0", "n1")]
    df = spark.createDataFrame(edges, "src string, dst string")
    narrow = {r["node"]: r["rank_nano"]
              for r in pagerank(df, iterations=3).collect()}
    wide = {r["node"]: int(r["rank_nano"])
            for r in pagerank(df, iterations=3, decimal=True,
                              materialize=True).collect()}
    assert narrow == wide
    total_cap = len(narrow) * INIT_NANO
    for v in wide.values():
        assert TELEPORT_NANO <= v <= TELEPORT_NANO + total_cap


def test_table_diff_digest_is_prefix_coded(spark):
    """("ab","c") and ("a","bc") must NOT collide: the length prefix
    makes the digest a prefix code over tracked columns."""
    from event_streaming_service_spark.operators.diff import table_diff
    old = spark.createDataFrame([(1, "ab", "c")], "k bigint, x string, y string")
    new = spark.createDataFrame([(1, "a", "bc")], "k bigint, x string, y string")
    row = table_diff(old, new, ["k"], ["x", "y"]).first()
    assert row["change_kind"] == "changed"


@settings(**_SETTINGS)
@given(st.lists(st.text(alphabet=st.characters(
    whitelist_categories=("Lu", "Ll", "Nd", "Po", "Zs")),
    min_size=0, max_size=40), min_size=1, max_size=15))
def test_char_gini_bounds_and_degenerate_cases(spark, texts):
    """gini_ppm in [0, 1e6); 0 iff one distinct char; n and s2
    consistent with the literal Python recount."""
    from collections import Counter

    from event_streaming_service_spark.operators.curation import char_gini
    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id long, text string")
    got = {r["doc_id"]: r for r in char_gini(df).collect()}
    for i, t in enumerate(texts):
        if not t:
            assert i not in got
            continue
        c = Counter(t)
        n, s2 = len(t), sum(v * v for v in c.values())
        r = got[i]
        assert r["n_chars_counted"] == n
        assert r["distinct_chars"] == len(c)
        want = (n * n - s2) * 1_000_000 // (n * n)
        assert r["gini_ppm"] == want
        assert 0 <= r["gini_ppm"] < 1_000_000
        assert (r["gini_ppm"] == 0) == (len(c) == 1)


@settings(**_SETTINGS)
@given(st.lists(st.integers(min_value=-10**9, max_value=10**9),
                min_size=1, max_size=40, unique=True))
def test_curriculum_buckets_partition_the_input(spark, ids):
    """Every row lands in exactly one bucket 1..n; bucket sizes differ
    by at most 1; ordering by (score, id) is respected."""
    from event_streaming_service_spark.operators.curation import (
        curriculum_buckets,
    )
    rows = [(i, float(abs(i) % 7)) for i in ids]
    df = spark.createDataFrame(rows, "doc_id long, s double")
    out = curriculum_buckets(df, "s", "doc_id", n_buckets=3).collect()
    assert len(out) == len(ids)
    sizes = {}
    for r in out:
        assert 1 <= r["bucket"] <= 3
        sizes[r["bucket"]] = sizes.get(r["bucket"], 0) + 1
    present = [sizes.get(b, 0) for b in (1, 2, 3)]
    assert max(present) - min(p for p in present if p) <= 1 or len(ids) < 3
    ordered = sorted(out, key=lambda r: (r["s"], r["doc_id"]))
    buckets_in_order = [r["bucket"] for r in ordered]
    assert buckets_in_order == sorted(buckets_in_order)
