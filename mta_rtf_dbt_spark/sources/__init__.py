from mta_rtf_dbt_spark.sources.registry import (  # noqa: F401
    TESTDATA_TABLES,
    load,
    register_all,
)
