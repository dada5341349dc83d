"""Versioned schema registry (SURVEY.md section 1.3, A8/A9, J2).

Spark-side restatement of the reference's SchemaRegistryService
(service/SchemaRegistryService.java): subjects named `<topic>-value` /
`<topic>-key` hold ordered StructType versions; compatibility default
is FULL_TRANSITIVE (application.yml:98-102) = new schema must be both
backward- and forward-compatible with EVERY registered version, which
for structural schemas means: only additive nullable fields, no type
changes, no removals.

The catalog is a plain in-process dict (the reference caches schemas
in-process too, CacheConfig.java:41-50); `to_dataframe` exposes it as
a DataFrame so the A8/A9 statistics queries run on it like any table.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


@dataclass
class SchemaVersion:
    subject: str
    version: int
    schema_id: int
    schema: T.StructType
    schema_type: str = "STRUCT"
    compatibility: str = "FULL_TRANSITIVE"


class CompatibilityError(ValueError):
    pass


def _fields(s: T.StructType) -> dict[str, T.StructField]:
    return {f.name: f for f in s.fields}


def is_backward_compatible(new: T.StructType, old: T.StructType) -> bool:
    """A reader with `new` can read data written with `old`: every field
    the new schema requires must exist in old with the same type, and
    fields added by new must be nullable (defaultable)."""
    old_f = _fields(old)
    for f in new.fields:
        if f.name in old_f:
            if f.dataType != old_f[f.name].dataType:
                return False
        elif not f.nullable:
            return False
    return True


def is_forward_compatible(new: T.StructType, old: T.StructType) -> bool:
    """Data written with `new` is readable by an `old` reader."""
    return is_backward_compatible(old, new)


def is_full_compatible(new: T.StructType, old: T.StructType) -> bool:
    return (is_backward_compatible(new, old)
            and is_forward_compatible(new, old))


@dataclass
class SchemaRegistry:
    """register / evolve / test-compatibility / latest — the service's
    endpoint surface (SchemaRegistryService.java:56-121, 190-247,
    304-319)."""

    DEFAULT_COMPATIBILITY = "FULL_TRANSITIVE"  # application.yml:98-102

    _subjects: dict[str, list[SchemaVersion]] = field(default_factory=dict)
    _compat_overrides: dict[str, str] = field(default_factory=dict)
    _next_id: int = 1

    def register(self, subject: str, schema: T.StructType,
                 compatibility: str | None = None) -> SchemaVersion:
        """Register a version under the subject's effective compatibility:
        an explicit argument wins, else the subject-level override
        (set_compatibility), else the registry default."""
        compatibility = compatibility or self.get_compatibility(subject)
        versions = self._subjects.setdefault(subject, [])
        if versions and compatibility != "NONE":
            for prior in versions:
                if not self._compatible(schema, prior.schema, compatibility):
                    raise CompatibilityError(
                        f"{subject}: new schema is not {compatibility}-"
                        f"compatible with version {prior.version}")
        sv = SchemaVersion(subject=subject, version=len(versions) + 1,
                           schema_id=self._next_id, schema=schema,
                           compatibility=compatibility)
        self._next_id += 1
        versions.append(sv)
        return sv

    # -- subject-level compatibility + deletion
    #    (SchemaRegistryService.java:157-214) --

    def set_compatibility(self, subject: str, compatibility: str) -> None:
        """Per-subject compatibility override (:190-200). Validates the
        mode eagerly — the reference surfaces the registry's rejection."""
        self._compatible(T.StructType([]), T.StructType([]), compatibility)
        self._compat_overrides[subject] = compatibility

    def get_compatibility(self, subject: str) -> str:
        """Effective level: override else default (:205-214)."""
        return self._compat_overrides.get(subject, self.DEFAULT_COMPATIBILITY)

    def delete_subject(self, subject: str) -> list[int]:
        """Delete a subject and return its version numbers (:157-166)."""
        versions = self._subjects.pop(subject, [])
        self._compat_overrides.pop(subject, None)
        return [sv.version for sv in versions]

    def delete_version(self, subject: str, version: int) -> None:
        """Delete one schema version (:173-183). Remaining versions keep
        their numbers (registry semantics: version ids are never
        reused); an empty subject disappears."""
        versions = self._subjects.get(subject)
        if not versions:
            raise KeyError(subject)
        for i, sv in enumerate(versions):
            if sv.version == version:
                del versions[i]
                break
        else:
            raise KeyError(f"{subject} v{version}")
        if not versions:
            del self._subjects[subject]

    @staticmethod
    def _compatible(new: T.StructType, old: T.StructType, mode: str) -> bool:
        if mode == "BACKWARD":
            return is_backward_compatible(new, old)
        if mode == "FORWARD":
            return is_forward_compatible(new, old)
        if mode in ("FULL", "FULL_TRANSITIVE"):
            return is_full_compatible(new, old)
        if mode == "NONE":
            return True
        raise ValueError(f"unknown compatibility mode: {mode}")

    def test_compatibility(self, subject: str, schema: T.StructType) -> bool:
        """Dry-run check (SchemaRegistryService.java:304-319)."""
        versions = self._subjects.get(subject, [])
        return all(is_full_compatible(schema, v.schema) for v in versions)

    def latest(self, subject: str) -> SchemaVersion:
        """A9: Collections.max(versions) (:110-121)."""
        versions = self._subjects.get(subject)
        if not versions:
            raise KeyError(subject)
        return versions[-1]

    def get(self, subject: str, version: int) -> SchemaVersion:
        for sv in self._subjects.get(subject, ()):
            if sv.version == version:
                return sv
        raise KeyError(f"{subject} v{version}")

    def subjects(self) -> list[str]:
        return sorted(self._subjects)

    def schemas_for_topic(self, topic: str) -> dict[str, SchemaVersion | None]:
        """J2: `<topic>-value` / `<topic>-key` lookup (:277-299)."""
        out: dict[str, SchemaVersion | None] = {}
        for kind in ("value", "key"):
            subject = f"{topic}-{kind}"
            out[kind] = (self._subjects[subject][-1]
                         if subject in self._subjects else None)
        return out

    def to_dataframe(self, spark: SparkSession) -> DataFrame:
        """The registry as a table, so A8 statistics run as plain queries."""
        rows = [
            (sv.subject, sv.version, sv.schema_id, sv.schema.json(),
             sv.schema_type, sv.compatibility)
            for versions in self._subjects.values() for sv in versions
        ]
        return spark.createDataFrame(
            rows, "subject string, version int, id int, schema_json string, "
                  "schema_type string, compatibility string")

    def statistics(self) -> dict:
        """A8: subject counts by suffix kind + version stats
        (SchemaRegistryService.java:324-366)."""
        subjects = self.subjects()
        by_kind = {"value": 0, "key": 0, "other": 0}
        for s in subjects:
            if s.endswith("-value"):
                by_kind["value"] += 1
            elif s.endswith("-key"):
                by_kind["key"] += 1
            else:
                by_kind["other"] += 1
        nv = [len(self._subjects[s]) for s in subjects]
        return {
            "total_subjects": len(subjects),
            "by_kind": by_kind,
            "total_versions": sum(nv),
            "max_versions": max(nv, default=0),
            "avg_versions": (sum(nv) / len(nv)) if nv else 0.0,
        }


def merge_schemas(a: T.StructType, b: T.StructType) -> T.StructType:
    """Additive evolution union (the mergeSchema read path): fields of
    `a` plus fields only in `b`, all nullable."""
    out = list(a.fields)
    have = {f.name for f in a.fields}
    for f in b.fields:
        if f.name not in have:
            out.append(T.StructField(f.name, f.dataType, True))
    return T.StructType(out)


def schema_fingerprint(schema: T.StructType) -> str:
    """Stable content id for a schema (sorted canonical JSON)."""
    import hashlib

    canon = json.dumps(json.loads(schema.json()), sort_keys=True)
    return hashlib.md5(canon.encode()).hexdigest()
