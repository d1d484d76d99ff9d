"""Central query registry: name -> (Spark callable, DuckDB oracle SQL).

Every operator from SURVEY.md §2 is exposed as a named query; the driver
contract (__spark_entry__.py) runs the Spark side against the fixture
tables and the oracle SQL against DuckDB over the same parquet files,
comparing row count + schema + order-insensitive value hash.

Registration is decorator-based; importing ``wsu_cpts_415_spark.queries``
populates the registry.  Determinism rules for every registered query:

  * every computed column is aliased identically in Spark and SQL;
  * every top-k / limit has a total-order tie-break;
  * float aggregates are rounded before output (driver hashes values);
  * no order-sensitive aggregate (collect_list) without a sort guarantee.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None => rows-only check
    doc: str


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    """Import every query module (side effect: registration) and return all."""
    import wsu_cpts_415_spark.queries  # noqa: F401

    return dict(REGISTRY)
