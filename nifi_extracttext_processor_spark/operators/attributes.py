"""B8–B11, B17: attribute handling, record serialization, schema inference.

Reference behaviors re-expressed as Catalyst-native column ops:
  B8  AttributeCleanerProcessor (56409-tika.xml:1450): sanitize names
      for downstream schema use → lowercase + [^a-z0-9_] → '_'.
  B9  AttributesToJSON (:2185-2212): attribute map → JSON content.
  B10 InferAvroSchema (:1592-1650): schema from a sample of JSON records.
  B11 UpdateAttribute "Set Schema" (:804-816): static literal columns.
  B17 record readers/writers (:451-660): from_json / to_json round-trip
      with a named-schema registry dict.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def clean_name(name: str) -> str:
    """B8 sanitizer for one identifier."""
    return re.sub(r"[^a-z0-9_]", "_", name.lower())


def clean_names(df: DataFrame) -> DataFrame:
    """B8 over column names (our typed stand-in for NiFi attributes)."""
    return df.toDF(*[clean_name(c) for c in df.columns])


def clean_map_keys(df: DataFrame, map_col: str) -> DataFrame:
    """B8 over a map<string,string> attribute bag — JVM-side transform."""
    return df.withColumn(
        map_col,
        F.map_from_arrays(
            F.transform(F.map_keys(F.col(map_col)),
                        lambda k: F.regexp_replace(F.lower(k),
                                                   "[^a-z0-9_]", "_")),
            F.map_values(F.col(map_col))))


def attrs_to_json(
    df: DataFrame,
    cols: list[str] | None = None,
    out_col: str = "json",
    keep_cols: bool = True,
) -> DataFrame:
    """B9: serialize selected columns as a JSON object column.

    `Include Core Attributes=false` ≈ caller picks `cols`; NiFi's
    `Null Value=true` (emit nulls) ≈ ignoreNullFields=false.
    """
    cols = cols or df.columns
    j = F.to_json(F.struct(*[F.col(c) for c in cols]),
                  {"ignoreNullFields": "false"})
    out = df.withColumn(out_col, j)
    if not keep_cols:
        keep = [c for c in df.columns if c not in cols] + [out_col]
        out = out.select(*keep)
    return out


def infer_json_schema(
    spark: SparkSession,
    df: DataFrame,
    json_col: str = "json",
    sample_rows: int = 25,
) -> StructType:
    """B10: infer a schema from the first N JSON records (N=25 mirrors
    InferAvroSchema's `Number Of Records To Analyze`, 56409-tika.xml:1650).

    The sample is a driver-side limit(N) — constant cost at any scale.
    """
    sample = [r[0] for r in df.select(json_col).limit(sample_rows).collect()
              if r[0] is not None]
    return spark.read.json(
        spark.sparkContext.parallelize(sample)).schema


def set_attrs(df: DataFrame, attrs: dict[str, str]) -> DataFrame:
    """B11: static attribute sets (schema.name=PDF etc.) as literal cols."""
    for k, v in attrs.items():
        df = df.withColumn(clean_name(k), F.lit(v))
    return df


class SchemaRegistry:
    """Versioned named-schema registry standing in for
    HortonworksSchemaRegistry (B17, 56409-tika.xml:529): the flow
    resolves schemas by name (`schema-access-strategy=schema-name`,
    `schema-name=${schema.name}`); real registries add monotonically
    increasing versions per name.

    Resolution (`get`):
      * version=None  → the latest registered version (the reader
        default — what `cache-schema=true` consumers see)
      * exact version → that schema
      * missing exact → NEAREST version ≤ the requested one (a reader
        pinned to v5 of a name whose registry holds v1,v3 reads v3 —
        version-forward compatibility for rolling upgrades); below the
        oldest version is an error.
    """

    def __init__(self) -> None:
        self._schemas: dict[str, dict[int, StructType]] = {}

    def register(self, name: str, schema: StructType,
                 version: int | None = None) -> int:
        """Register a schema version; auto-increments when version is
        omitted. Returns the version registered."""
        versions = self._schemas.setdefault(name, {})
        if version is None:
            version = max(versions, default=0) + 1
        if version < 1:
            raise ValueError("schema versions start at 1")
        versions[version] = schema
        return version

    def get(self, name: str, version: int | None = None) -> StructType:
        versions = self._schemas[name]
        if version is None:
            return versions[max(versions)]
        if version in versions:
            return versions[version]
        older = [v for v in versions if v < version]
        if not older:
            raise KeyError(
                f"schema {name!r} has no version <= {version} "
                f"(available: {sorted(versions)})")
        return versions[max(older)]

    def versions(self, name: str) -> list[int]:
        return sorted(self._schemas.get(name, {}))

    def names(self) -> list[str]:
        return sorted(self._schemas)


def read_records_by_name(
    df: DataFrame,
    registry: SchemaRegistry,
    name: str,
    version: int | None = None,
    json_col: str = "json",
    out_col: str = "record",
) -> DataFrame:
    """B17 JsonTreeReader with registry resolution: the streaming/flow
    form where `${schema.name}` picks the schema — parse `json_col`
    against the registry's (name, version) resolution."""
    return read_records(df, registry.get(name, version), json_col, out_col)


def read_records(
    df: DataFrame,
    schema: StructType | str,
    json_col: str = "json",
    out_col: str = "record",
) -> DataFrame:
    """B17 JsonTreeReader: parse JSON content against a declared schema."""
    return df.withColumn(out_col, F.from_json(F.col(json_col), schema))


def flatten_record(df: DataFrame, record_col: str = "record") -> DataFrame:
    """Expand a parsed record struct to top-level columns."""
    others = [c for c in df.columns if c != record_col]
    return df.select(*others, F.col(f"{record_col}.*"))
