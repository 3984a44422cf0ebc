from nomenklatura_spark.model.statement import (  # noqa: F401
    STATEMENT_SCHEMA,
    STATEMENT_COLUMNS,
    statements_from_wide_table,
)
