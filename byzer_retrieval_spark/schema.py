"""Table schema: the reference's ``st(field(...))`` string DSL → Spark.

The reference declares schemas as strings like
``st(field(_id,long),field(content,string,analyze),field(vector,array(float)))``
parsed by a recursive-descent parser (reference:
schema/SimpleSchemaParser.java:24-93) with per-field options
``analyze | sort | no_index`` of which at most one is honored
(SimpleSchemaParser.java:79-83). We accept the same DSL (fresh
implementation) and map it to a Spark ``StructType`` plus field options
that drive the index builder:

- ``analyze``  → tokenized into the postings table; NOT stored in the
  docs table (reference stores analyzed fields with Store.NO,
  SchemaUtils.java:35 — we mirror that: query results never return the
  analyzed body, only stored fields).
- ``sort``     → kept as a plain column (columnar parquet is already a
  doc-value); orderBy uses it directly.
- ``no_index`` → stored-only payload column.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import List, Optional

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    ByteType,
    DataType,
    DateType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    ShortType,
    StringType,
    StructField,
    StructType,
)

ANALYZE = "analyze"
SORT = "sort"
NO_INDEX = "no_index"
_OPTIONS = {ANALYZE, SORT, NO_INDEX}

_SIMPLE_TYPES = {
    "boolean": BooleanType(),
    "byte": ByteType(),
    "short": ShortType(),
    "date": DateType(),
    "int": IntegerType(),
    "integer": IntegerType(),
    "long": LongType(),
    "float": FloatType(),
    "double": DoubleType(),
    "decimal": DecimalType(38, 18),
    "binary": BinaryType(),
    "string": StringType(),
}


@dataclass
class FieldDef:
    name: str
    type_name: str
    options: List[str] = dc_field(default_factory=list)

    @property
    def analyzed(self) -> bool:
        return ANALYZE in self.options

    @property
    def stored(self) -> bool:
        # analyzed fields are Store.NO in the reference (SchemaUtils.java:35)
        return not self.analyzed

    @property
    def indexed(self) -> bool:
        return NO_INDEX not in self.options

    def spark_type(self) -> DataType:
        return _parse_type(self.type_name)


@dataclass
class TableSchema:
    fields: List[FieldDef]

    def field(self, name: str) -> Optional[FieldDef]:
        for f in self.fields:
            if f.name == name:
                return f
        return None

    @property
    def analyzed_fields(self) -> List[str]:
        return [f.name for f in self.fields if f.analyzed]

    @property
    def stored_fields(self) -> List[str]:
        return [f.name for f in self.fields if f.stored]

    def to_struct_type(self, stored_only: bool = False) -> StructType:
        fs = self.fields
        if stored_only:
            fs = [f for f in fs if f.stored]
        return StructType(
            [StructField(f.name, f.spark_type(), True) for f in fs]
        )


class SchemaParseError(ValueError):
    pass


def _parse_type(type_name: str) -> DataType:
    t = type_name.strip()
    if t in _SIMPLE_TYPES:
        return _SIMPLE_TYPES[t]
    if t.startswith("array(") and t.endswith(")"):
        return ArrayType(_parse_type(t[len("array(") : -1]))
    if t.startswith("map(") and t.endswith(")"):
        inner = _split_top(t[len("map(") : -1])
        if len(inner) != 2:
            raise SchemaParseError(f"map needs 2 type args: {type_name}")
        return MapType(_parse_type(inner[0]), _parse_type(inner[1]))
    if t.startswith("st(") and t.endswith(")"):
        return parse_schema(t).to_struct_type()
    raise SchemaParseError(f"unknown type {type_name!r}")


def _split_top(s: str) -> List[str]:
    """Split on commas at paren depth 0."""
    parts, depth, cur = [], 0, []
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth < 0:
                raise SchemaParseError(f"unbalanced parens in {s!r}")
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur))
    if depth != 0:
        raise SchemaParseError(f"unbalanced parens in {s!r}")
    return [p.strip() for p in parts if p.strip()]


def parse_schema(dsl: str) -> TableSchema:
    """Parse ``st(field(name,type[,option]),...)`` (whitespace tolerant)."""
    s = "".join(dsl.split())  # the reference DSL tolerates newlines/spaces
    if not (s.startswith("st(") and s.endswith(")")):
        raise SchemaParseError("schema must be st(...)")
    fields: List[FieldDef] = []
    for part in _split_top(s[len("st(") : -1]):
        if not (part.startswith("field(") and part.endswith(")")):
            raise SchemaParseError(f"expected field(...), got {part!r}")
        args = _split_top(part[len("field(") : -1])
        if len(args) < 2:
            raise SchemaParseError(f"field needs name,type: {part!r}")
        name, type_name, opts = args[0], args[1], args[2:]
        bad = [o for o in opts if o not in _OPTIONS]
        if bad:
            raise SchemaParseError(f"unknown field option(s) {bad} in {part!r}")
        _parse_type(type_name)  # validate eagerly
        # reference honors at most one option (SimpleSchemaParser.java:79-83)
        fields.append(FieldDef(name, type_name, opts[:1]))
    return TableSchema(fields)
