"""Schema registry + tolerant projection.

Re-expresses the reference's COLUMN_MAPPING_AND_TYPES pattern
(ETL - Venda B2B.py:28-54, ETL - Faturamento B2B.py:21-52): one
declaration that is simultaneously a projection list, a rename map and
a type contract — with missing source columns tolerated (warn + NULL
fill, ref ETL - Primeiro Pedido.py:141-148).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

log = logging.getLogger(__name__)

_TYPE_ALIASES = {
    "int": T.IntegerType(),
    "bigint": T.LongType(),
    "long": T.LongType(),
    "double": T.DoubleType(),
    "float": T.FloatType(),
    "string": T.StringType(),
    "date": T.DateType(),
    "timestamp": T.TimestampType(),
    "boolean": T.BooleanType(),
}


def _resolve_type(t: str | T.DataType) -> T.DataType:
    if isinstance(t, T.DataType):
        return t
    key = t.strip().lower()
    if key.startswith("decimal"):
        inner = key[len("decimal"):].strip("()")
        p, s = (int(x) for x in inner.split(",")) if inner else (10, 0)
        return T.DecimalType(p, s)
    return _TYPE_ALIASES[key]


@dataclass
class DatasetSchema:
    """Declared staging schema: source column → (target name, type)."""

    name: str
    mapping: dict[str, tuple[str, str | T.DataType]]
    required: list[str] = field(default_factory=list)

    def struct_type(self) -> T.StructType:
        return T.StructType(
            [
                T.StructField(tgt, _resolve_type(t), True)
                for tgt, t in self.mapping.values()
            ]
        )

    def apply(self, df: DataFrame, strict: bool = False) -> DataFrame:
        """Project+rename+cast; missing source columns become typed
        NULLs with a warning (or raise when strict)."""
        cols = []
        available = {c.lower(): c for c in df.columns}
        for src, (tgt, t) in self.mapping.items():
            dt = _resolve_type(t)
            actual = available.get(src.lower())
            if actual is None:
                if strict:
                    raise ValueError(f"{self.name}: missing column {src!r}")
                log.warning("%s: column %r missing; filling NULL", self.name, src)
                cols.append(F.lit(None).cast(dt).alias(tgt))
            else:
                cols.append(F.col(actual).cast(dt).alias(tgt))
        out = df.select(*cols)
        if self.required:
            out = out.na.drop(subset=self.required)
        return out


def schema_drift(
    before: T.StructType, after: T.StructType
) -> list[dict[str, str]]:
    """Classify schema evolution between two table versions — the
    guard an ingest job runs before appending a new extract onto an
    existing staging table: ``added`` (new column), ``removed``
    (column gone), ``type_changed`` (same name, different type).
    Name matching is case-insensitive (Spark's resolution default);
    the returned kinds drive the policy — fail on ``type_changed``,
    backfill NULLs on ``added``, project away on ``removed`` (the
    latter two are what :meth:`DatasetSchema.apply` already does).

    Pure driver-side metadata comparison: no data is read."""
    b = {f.name.lower(): f for f in before.fields}
    a = {f.name.lower(): f for f in after.fields}
    report: list[dict[str, str]] = []
    for name in sorted(set(a) - set(b)):
        report.append(
            {"column": a[name].name, "kind": "added",
             "type": a[name].dataType.simpleString()}
        )
    for name in sorted(set(b) - set(a)):
        report.append(
            {"column": b[name].name, "kind": "removed",
             "type": b[name].dataType.simpleString()}
        )
    for name in sorted(set(b) & set(a)):
        tb, ta = b[name].dataType, a[name].dataType
        if tb != ta:
            report.append(
                {"column": a[name].name, "kind": "type_changed",
                 "type": f"{tb.simpleString()} -> {ta.simpleString()}"}
            )
    return report
