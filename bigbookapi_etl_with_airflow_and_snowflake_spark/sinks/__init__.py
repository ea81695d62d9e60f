"""Sinks (SURVEY.md §2.2 K1-K7): files, JDBC append/upsert, Snowflake."""

from .files import write_json, write_parquet  # noqa: F401
from .jdbc import JdbcUpsertWriter, jdbc_append_options, upsert_sql  # noqa: F401
from .snowflake import SnowflakeBulkLoadPlan, snowflake_writer_options  # noqa: F401
