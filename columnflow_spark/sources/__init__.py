from columnflow_spark.sources.tables import (  # noqa: F401
    BROADCAST_TABLES,
    TABLES,
    load_csv,
    load_json,
    load_table,
    load_tables,
    normalize_events_ts,
    spread,
    table_path,
)
