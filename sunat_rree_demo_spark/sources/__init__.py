from sunat_rree_demo_spark.sources.catalog import (  # noqa: F401
    TABLES,
    load_table,
    load_tables,
    register_views,
    table_exists,
)
