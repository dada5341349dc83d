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

def test_subject_compatibility_override():
    r = reg.SchemaRegistry()
    assert r.get_compatibility("s-value") == "FULL_TRANSITIVE"
    r.set_compatibility("s-value", "NONE")
    assert r.get_compatibility("s-value") == "NONE"
    r.register("s-value", BASE)
    # removal of a field violates FULL but NONE admits it
    narrowed = T.StructType(BASE.fields[:1])
    r.register("s-value", narrowed)
    assert r.latest("s-value").version == 2
    with pytest.raises(ValueError):
        r.set_compatibility("s-value", "SIDEWAYS")
    # explicit argument still wins over the override
    with pytest.raises(reg.CompatibilityError):
        r.register("s-value", T.StructType([]), compatibility="FULL")


def test_delete_subject_and_version():
    r = reg.SchemaRegistry()
    r.register("d-value", BASE)
    r.register("d-value", ADDED_NULLABLE)
    r.register("d-value", ADDED_NULLABLE)
    assert r.delete_subject("d-value") == [1, 2, 3]
    assert "d-value" not in r.subjects()
    assert r.delete_subject("d-value") == []

    r.register("e-value", BASE)
    r.register("e-value", ADDED_NULLABLE)
    r.delete_version("e-value", 1)
    # remaining version keeps its number; positional get still works
    assert r.latest("e-value").version == 2
    assert r.get("e-value", 2).version == 2
    with pytest.raises(KeyError):
        r.get("e-value", 1)
    r.delete_version("e-value", 2)
    assert "e-value" not in r.subjects()
    with pytest.raises(KeyError):
        r.delete_version("e-value", 1)
