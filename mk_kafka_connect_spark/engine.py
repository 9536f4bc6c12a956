"""Engine facade — the SparkSession-wrapped entry point from SURVEY.md §7:
one object that owns the session, the table catalog, the SQL surface, the
declared query registry, and the transform chain.

A user of the reference switches like this::

    from mk_kafka_connect_spark.engine import Engine
    eng = Engine.local()                       # or Engine(existing_spark)
    eng.register("/root/testdata/sf0.01")      # catalog → temp views
    eng.sql("SELECT count(*) FROM lineitem")   # SQL surface
    eng.query("q1_pricing_summary")            # declared operator surface
    eng.transform(df, [{"name": "string_cast", "fields": ["x"]}])
"""

from __future__ import annotations

from collections.abc import Sequence
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from . import catalog as _catalog
from .session import get_spark
from .transforms import apply_chain

__all__ = ["Engine"]


class Engine:
    def __init__(self, spark: SparkSession, sf_dir: str | None = None):
        self.spark = spark
        self.sf_dir = sf_dir or _catalog.default_sf_dir()
        self._tables: dict[str, DataFrame] = {}

    @classmethod
    def local(cls, sf_dir: str | None = None, **conf: str) -> "Engine":
        return cls(get_spark(extra_conf=conf or None), sf_dir)

    # -- catalog ----------------------------------------------------------

    def register(self, sf_dir: str | None = None) -> "Engine":
        """Load every table and register temp views (SQL + DataFrame see
        the same catalog)."""
        if sf_dir:
            self.sf_dir = sf_dir
        self._tables = _catalog.register_views(self.spark, self.sf_dir)
        return self

    def table(self, name: str) -> DataFrame:
        if name not in self._tables:
            self._tables[name] = _catalog.load_table(self.spark, self.sf_dir, name)
        return self._tables[name]

    # -- query surfaces ---------------------------------------------------

    def sql(self, statement: str) -> DataFrame:
        if not self._tables:
            self.register()
        return self.spark.sql(statement)

    def query(self, name: str) -> DataFrame:
        """Run a declared query from the registry against this engine's
        scale-factor directory."""
        from .plans import QUERIES

        return QUERIES[name].fn(self.spark, self.sf_dir)

    def queries(self) -> list[str]:
        from .plans import QUERIES

        return sorted(QUERIES)

    def transform(self, df: DataFrame, chain: Sequence[dict[str, Any]]) -> DataFrame:
        return apply_chain(df, chain)

    def explain(self, name: str) -> str:
        """Formatted physical plan of a declared query — the tool for the
        'is this the plan I'd want at 100 TB' check."""
        df = self.query(name)
        return df._jdf.queryExecution().explainString(  # noqa: SLF001
            self.spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
