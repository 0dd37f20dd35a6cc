"""Schema-drift detection for incremental ingest.

The snapshot upsert (reference etl-utils.ts:258-355 semantics) unions
batches over time; when an upstream tap changes its schema, the right
moment to notice is BEFORE the merge, not when a cast fails three
stages later. ``schema_drift`` compares two Spark schemas field by
field (recursively through structs) and classifies every difference:

- ``added`` / ``removed`` columns,
- ``type_changed`` (with a ``widening`` flag for the safe numeric
  promotions the engine's merge coercion already performs —
  int->long, float->double, recursively through array elements and
  map keys/values: array<int> -> array<bigint> is the same promotion
  one level down),
- ``nullability_changed``.

Pure metadata (two ``StructType``s — no data scan, no Spark jobs), so
it costs nothing at any corpus size and can gate every ingest batch.
``assert_no_drift`` raises with the full report when a non-widening
change appears.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T

__all__ = ["SchemaDrift", "schema_drift", "assert_no_drift"]

_WIDENINGS = {
    ("int", "bigint"),
    ("smallint", "int"),
    ("smallint", "bigint"),
    ("tinyint", "smallint"),
    ("tinyint", "int"),
    ("tinyint", "bigint"),
    ("float", "double"),
}


@dataclass
class SchemaDrift:
    added: list[str] = field(default_factory=list)
    removed: list[str] = field(default_factory=list)
    type_changed: list[tuple[str, str, str, bool]] = field(default_factory=list)
    nullability_changed: list[str] = field(default_factory=list)

    @property
    def breaking(self) -> list[tuple[str, str, str]]:
        """Type changes that are NOT safe widenings (removed columns
        are tolerated by unionByName(allowMissingColumns); added
        columns appear as nulls in history)."""
        return [
            (p, a, b) for p, a, b, widening in self.type_changed if not widening
        ]

    def __bool__(self) -> bool:
        return bool(
            self.added or self.removed or self.type_changed
            or self.nullability_changed
        )


def _is_widening(old: T.DataType, new: T.DataType) -> bool:
    # ONLY the numeric promotions the snapshot merge actually performs
    # count as safe: a string-target change is lossless on paper but
    # the union's type reconciliation casts the STRING side numeric at
    # runtime (observed: merging amount string into amount double threw
    # CAST_INVALID_INPUT mid-job) — exactly the failure this gate
    # exists to move to ingest time.
    #
    # Containers recurse: the union's type reconciliation promotes
    # element types the same way it promotes top-level columns, so
    # array<int> -> array<bigint> (and the map key/value analogues)
    # are the same safe widenings one level down. Containment kind
    # must match exactly — array -> map or array -> scalar is breaking.
    if isinstance(old, T.ArrayType) and isinstance(new, T.ArrayType):
        return old.containsNull == new.containsNull and _is_widening(
            old.elementType, new.elementType
        )
    if isinstance(old, T.MapType) and isinstance(new, T.MapType):
        return (
            old.valueContainsNull == new.valueContainsNull
            and (
                old.keyType == new.keyType
                or _is_widening(old.keyType, new.keyType)
            )
            and (
                old.valueType == new.valueType
                or _is_widening(old.valueType, new.valueType)
            )
        )
    return (old.simpleString(), new.simpleString()) in _WIDENINGS


def _walk(old: T.StructType, new: T.StructType, prefix: str, out: SchemaDrift):
    old_fields = {f.name: f for f in old.fields}
    new_fields = {f.name: f for f in new.fields}
    for name in old_fields:
        if name not in new_fields:
            out.removed.append(prefix + name)
    for name, nf in new_fields.items():
        path = prefix + name
        if name not in old_fields:
            out.added.append(path)
            continue
        of = old_fields[name]
        if isinstance(of.dataType, T.StructType) and isinstance(
            nf.dataType, T.StructType
        ):
            _walk(of.dataType, nf.dataType, path + ".", out)
        elif of.dataType != nf.dataType:
            out.type_changed.append(
                (
                    path,
                    of.dataType.simpleString(),
                    nf.dataType.simpleString(),
                    _is_widening(of.dataType, nf.dataType),
                )
            )
        if of.nullable != nf.nullable:
            out.nullability_changed.append(path)


def schema_drift(old: T.StructType, new: T.StructType) -> SchemaDrift:
    """Field-by-field drift report between two schemas (recursive
    through nested structs). Pure metadata — no Spark jobs."""
    out = SchemaDrift()
    _walk(old, new, "", out)
    return out


def assert_no_drift(old: T.StructType, new: T.StructType) -> SchemaDrift:
    """Gate an ingest batch: returns the (possibly empty) report, but
    raises ``ValueError`` when a BREAKING change (non-widening type
    change) is present — the case the downstream merge coercion would
    turn into nulls or a hard failure."""
    drift = schema_drift(old, new)
    if drift.breaking:
        raise ValueError(
            "schema drift with breaking type changes: "
            + ", ".join(f"{p}: {a} -> {b}" for p, a, b in drift.breaking)
        )
    return drift
