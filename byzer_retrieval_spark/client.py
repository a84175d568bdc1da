"""LocalByzerStorage-compatible client facade (reference python_api.md).

The reference ships a fluent Python client over its Arrow Flight server:
``schema_builder / write_builder / query_builder / commit /
delete_by_id(s) / truncate_table / get_by_id(s)`` (python_api.md:24-232,
test_retrieval.py, byzer_storage_direct_query_example.py). This module
reproduces that exact surface over the Spark engine — no server, the
SparkSession IS the cluster. Embedding-LLM vectorization (storage.emb)
is out of scope: callers pass vectors, like the reference's
"externally provided vector" path (python_api.md:202-206).
"""

from __future__ import annotations

import json
from enum import Enum
from typing import Any, Dict, List, Optional, Sequence

from byzer_retrieval_spark.api import RetrievalEngine
from byzer_retrieval_spark.plans.query import SearchQuery


class DataType(str, Enum):
    STRING = "string"
    INTEGER = "int"
    LONG = "long"
    DOUBLE = "double"
    BOOLEAN = "boolean"
    FLOAT = "float"


class FieldOption(str, Enum):
    ANALYZE = "analyze"
    NO_INDEX = "no_index"
    SORT = "sort"


class SortOption(str, Enum):
    ASC = "asc"
    DESC = "desc"


class SchemaBuilder:
    def __init__(self, storage: "LocalByzerStorage"):
        self._storage = storage
        self._fields: List[str] = []

    def add_field(
        self, name: str, data_type: DataType, options: Optional[List[FieldOption]] = None
    ) -> "SchemaBuilder":
        opts = "," + ",".join(o.value for o in options) if options else ""
        self._fields.append(f"field({name},{data_type.value}{opts})")
        return self

    def add_array_field(self, name: str, data_type: DataType) -> "SchemaBuilder":
        self._fields.append(f"field({name},array({data_type.value}))")
        return self

    def dsl(self) -> str:
        return "st(" + ",".join(self._fields) + ")"

    def execute(self) -> bool:
        self._storage.engine.create_table(
            self._storage.database,
            self._storage.table,
            self.dsl(),
            num_shards=self._storage.num_shards,
        )
        return True


class WriteBuilder:
    def __init__(self, storage: "LocalByzerStorage"):
        self._storage = storage
        self._items: List[Dict[str, Any]] = []

    def add_item(
        self,
        item: Dict[str, Any],
        vector_fields: Optional[List[str]] = None,
        search_fields: Optional[List[str]] = None,
    ) -> "WriteBuilder":
        # vector_fields/search_fields accepted for API parity; the
        # analyzed/vector fields are already declared by the schema
        self._items.append(dict(item))
        return self

    def add_items(
        self,
        items: Sequence[Dict[str, Any]],
        vector_fields: Optional[List[str]] = None,
        search_fields: Optional[List[str]] = None,
    ) -> "WriteBuilder":
        for it in items:
            self.add_item(it, vector_fields, search_fields)
        return self

    def execute(self) -> Dict[str, Any]:
        return self._storage.engine.build_from_local(
            self._items, self._storage.database, self._storage.table
        )


class FilterBuilder:
    """``query.and_filter().add_condition(f, v).build()`` (python_api.md:181)."""

    def __init__(self, query: "QueryBuilder", op: str):
        self._query = query
        self._op = op
        self._conditions: List[Dict[str, Any]] = []

    def add_condition(self, field: str, value: Any) -> "FilterBuilder":
        self._conditions.append({"field": field, "value": value})
        return self

    def add_range(
        self, field: str, min_value: Any = None, max_value: Any = None
    ) -> "FilterBuilder":
        leaf: Dict[str, Any] = {"field": field}
        if min_value is not None:
            leaf["min"] = min_value
        if max_value is not None:
            leaf["max"] = max_value
        self._conditions.append(leaf)
        return self

    def build(self) -> "QueryBuilder":
        self._query._filters = {self._op: self._conditions}
        return self._query


class QueryBuilder:
    def __init__(self, storage: "LocalByzerStorage"):
        self._storage = storage
        self._filters: Dict[str, Any] = {}
        self._sorts: List[Dict[str, str]] = []
        self._keyword: Optional[str] = None
        self._fields: List[str] = []
        self._vector: List[float] = []
        self._vector_field: Optional[str] = None
        self._limit: int = 10

    def and_filter(self) -> FilterBuilder:
        return FilterBuilder(self, "and")

    def or_filter(self) -> FilterBuilder:
        return FilterBuilder(self, "or")

    def add_sort(self, field: str, order: SortOption = SortOption.ASC) -> "QueryBuilder":
        self._sorts.append({field: order.value})
        return self

    sort = add_sort  # byzer_storage_direct_query_example.py:88 spelling

    def set_limit(self, limit: int) -> "QueryBuilder":
        self._limit = limit
        return self

    def set_search_query(
        self, keyword: str, fields: Optional[List[str]] = None
    ) -> "QueryBuilder":
        self._keyword = keyword
        self._fields = list(fields or [])
        return self

    def set_vector_query(
        self, vector: Sequence[float], fields: Optional[List[str]] = None
    ) -> "QueryBuilder":
        self._vector = [float(x) for x in vector]
        if fields:
            self._vector_field = fields[0]
        return self

    def to_search_query(self) -> SearchQuery:
        return SearchQuery(
            database=self._storage.database,
            table=self._storage.table,
            keyword=self._keyword,
            fields=self._fields,
            filters=self._filters,
            sorts=self._sorts,
            vector=self._vector,
            vector_field=self._vector_field,
            limit=self._limit,
        )

    def execute(self) -> List[Dict[str, Any]]:
        q = self.to_search_query()
        eng = self._storage.engine
        db, tb = self._storage.database, self._storage.table
        if self._keyword is None and not self._vector:
            df = eng.filter(q, db, tb)  # filter-mode query (L1-L4)
        else:
            df = eng.search(q, db, tb)
        return [r.asDict(recursive=True) for r in df.collect()]


class LocalByzerStorage:
    """Drop-in shaped like the reference client (python_api.md:24-39) —
    ``host``/``port``/``emb_llm`` accepted and ignored (no server)."""

    def __init__(
        self,
        spark,
        root: str,
        namespace: str = "byzerai_store",
        database: str = "default",
        table: str = "default",
        num_shards: int = 8,
        host: Optional[str] = None,
        port: Optional[int] = None,
        emb_llm: Any = None,
    ):
        self.engine = RetrievalEngine(spark, root)
        self.namespace = namespace
        self.database = f"{namespace}.{database}" if namespace else database
        self.table = table
        self.num_shards = num_shards

    # builders -------------------------------------------------------------
    def schema_builder(self) -> SchemaBuilder:
        return SchemaBuilder(self)

    def write_builder(self) -> WriteBuilder:
        return WriteBuilder(self)

    def query_builder(self) -> QueryBuilder:
        return QueryBuilder(self)

    # lifecycle -------------------------------------------------------------
    def commit(self) -> bool:
        # our writes commit a snapshot on completion (Iceberg-style);
        # kept for API parity (reference: python_api.md:129-135)
        return self.engine.store(self.database, self.table).current_snapshot() is not None

    def truncate_table(self) -> bool:
        self.engine.truncate(self.database, self.table)
        return True

    def drop_table(self) -> bool:
        self.engine.drop(self.database, self.table)
        return True

    # point ops -------------------------------------------------------------
    def get_by_id(self, doc_id: str) -> Optional[Dict[str, Any]]:
        rows = self.engine.get_by_ids([doc_id], self.database, self.table).collect()
        return rows[0].asDict(recursive=True) if rows else None

    def get_by_ids(self, doc_ids: Sequence[str]) -> List[Dict[str, Any]]:
        rows = self.engine.get_by_ids(doc_ids, self.database, self.table).collect()
        return [r.asDict(recursive=True) for r in rows]

    def delete_by_id(self, doc_id: str) -> int:
        return self.engine.delete_by_ids([doc_id], self.database, self.table)

    def delete_by_ids(self, doc_ids: Sequence[str]) -> int:
        return self.engine.delete_by_ids(doc_ids, self.database, self.table)
