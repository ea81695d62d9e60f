"""Snowflake bulk-load sink (K5) behind an interface, CI-runnable
without Snowflake.

The reference loads by internal stage + PUT + COPY INTO (reference
dags/db_to_snowflake.py:93-112). In Spark the supported path is the
spark-snowflake connector, which performs the same stage+COPY
internally; :func:`snowflake_writer_options` produces the connector
options encoding the reference's semantics (case-insensitive column
matching, per-row error tolerance).

:class:`SnowflakeBulkLoadPlan` materializes the *exact SQL sequence* the
reference issues, for environments (like CI here) without a Snowflake
account or connector jar: callers run it through any SQL executor —
tests use a recording fake and assert semantic parity statement by
statement.
"""

from __future__ import annotations

from dataclasses import dataclass, field


def snowflake_writer_options(
    sf_url: str,
    sf_user: str,
    sf_database: str,
    sf_schema: str,
    sf_warehouse: str,
    table: str,
    on_error_continue: bool = True,
) -> dict[str, str]:
    """Options for ``df.write.format("snowflake")`` matching the
    reference's COPY semantics: MATCH_BY_COLUMN_NAME=CASE_INSENSITIVE →
    ``column_mapping=name`` + ``column_mismatch_behavior=ignore``;
    ON_ERROR='CONTINUE' → CONTINUE_ON_ERROR=ON."""
    opts = {
        "sfUrl": sf_url,
        "sfUser": sf_user,
        "sfDatabase": sf_database,
        "sfSchema": sf_schema,
        "sfWarehouse": sf_warehouse,
        "dbtable": table,
        "column_mapping": "name",
        "column_mismatch_behavior": "ignore",
    }
    if on_error_continue:
        opts["continue_on_error"] = "on"
    return opts


@dataclass
class SnowflakeBulkLoadPlan:
    """The reference's stage+COPY sequence as explicit SQL
    (dags/db_to_snowflake.py:77-112), executable by any runner."""

    table: str
    stage: str
    file_path: str
    columns: list[tuple[str, str]] = field(default_factory=list)
    on_error: str = "CONTINUE"

    def statements(self) -> list[str]:
        ddl_cols = ",\n  ".join(f"{n} {t}" for n, t in self.columns)
        stmts = []
        if self.columns:
            stmts.append(
                f"CREATE TABLE IF NOT EXISTS {self.table} (\n  {ddl_cols}\n)"
            )
        stmts.append(f"CREATE STAGE IF NOT EXISTS {self.stage}")
        stmts.append(
            f"PUT file://{self.file_path} @{self.stage} AUTO_COMPRESS=TRUE"
        )
        stmts.append(
            f"COPY INTO {self.table}\n"
            f"FROM @{self.stage}\n"
            f"FILE_FORMAT = (TYPE = PARQUET)\n"
            f"ON_ERROR = '{self.on_error}'\n"
            f"MATCH_BY_COLUMN_NAME = CASE_INSENSITIVE"
        )
        return stmts

    def run(self, execute) -> None:
        """Execute the plan through ``execute(sql)`` — a SnowflakeHook-
        style runner in production, a recording fake in tests."""
        for stmt in self.statements():
            execute(stmt)
