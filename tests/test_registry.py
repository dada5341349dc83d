"""Schema-registry tests mirroring SchemaRegistryService behavior:
versioning, FULL_TRANSITIVE compatibility, topic lookup, statistics."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from event_streaming_service_spark import registry as reg

BASE = T.StructType([
    T.StructField("event_id", T.StringType(), False),
    T.StructField("tenant_id", T.StringType(), True),
])
ADDED_NULLABLE = T.StructType(BASE.fields + [
    T.StructField("note", T.StringType(), True)])
ADDED_REQUIRED = T.StructType(BASE.fields + [
    T.StructField("must", T.StringType(), False)])
TYPE_CHANGED = T.StructType([
    T.StructField("event_id", T.LongType(), False),
    T.StructField("tenant_id", T.StringType(), True),
])


def test_register_versions_increment():
    r = reg.SchemaRegistry()
    v1 = r.register("nnipa.events.tenant-value", BASE)
    v2 = r.register("nnipa.events.tenant-value", ADDED_NULLABLE)
    assert (v1.version, v2.version) == (1, 2)
    assert r.latest("nnipa.events.tenant-value").version == 2
    assert v2.schema_id > v1.schema_id


def test_full_transitive_rejects_breaking_changes():
    r = reg.SchemaRegistry()
    r.register("s-value", BASE)
    with pytest.raises(reg.CompatibilityError):
        r.register("s-value", TYPE_CHANGED)
    with pytest.raises(reg.CompatibilityError):
        r.register("s-value", ADDED_REQUIRED)
    # additive nullable is FULL-compatible both directions
    r.register("s-value", ADDED_NULLABLE)
    # transitive: v3 must be compatible with v1 AND v2
    assert r.test_compatibility("s-value", ADDED_NULLABLE)
    assert not r.test_compatibility("s-value", TYPE_CHANGED)


def test_compat_mode_none_allows_anything():
    r = reg.SchemaRegistry()
    r.register("s", BASE, compatibility="NONE")
    r.register("s", TYPE_CHANGED, compatibility="NONE")
    assert r.latest("s").version == 2


def test_topic_lookup_value_and_key():
    r = reg.SchemaRegistry()
    r.register("nnipa.events.tenant-value", BASE)
    out = r.schemas_for_topic("nnipa.events.tenant")
    assert out["value"].version == 1 and out["key"] is None


def test_statistics_by_kind():
    r = reg.SchemaRegistry()
    r.register("a-value", BASE)
    r.register("a-value", ADDED_NULLABLE)
    r.register("a-key", BASE)
    r.register("misc", BASE)
    s = r.statistics()
    assert s["total_subjects"] == 3
    assert s["by_kind"] == {"value": 1, "key": 1, "other": 1}
    assert s["total_versions"] == 4 and s["max_versions"] == 2


def test_merge_and_fingerprint(spark):
    merged = reg.merge_schemas(BASE, ADDED_NULLABLE)
    assert {f.name for f in merged.fields} == {"event_id", "tenant_id", "note"}
    assert reg.schema_fingerprint(BASE) != reg.schema_fingerprint(ADDED_NULLABLE)
    assert reg.schema_fingerprint(BASE) == reg.schema_fingerprint(
        T.StructType(list(BASE.fields)))
    df = reg.SchemaRegistry()
    df.register("a-value", BASE)
    table = df.to_dataframe(spark)
    assert table.count() == 1 and table.first().subject == "a-value"