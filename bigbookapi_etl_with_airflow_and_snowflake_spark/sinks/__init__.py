"""Sinks (SURVEY.md §2.2 K1-K7): files, JDBC append/upsert, Snowflake."""

from .bucketed import read_bucketed, write_bucketed  # noqa: F401
from .files import write_json, write_parquet  # noqa: F401
from .jdbc import JdbcUpsertWriter, jdbc_append_options, upsert_sql  # noqa: F401
from .merge import merge_parquet  # noqa: F401
from .snowflake import SnowflakeBulkLoadPlan, snowflake_writer_options  # noqa: F401
