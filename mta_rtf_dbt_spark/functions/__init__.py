from mta_rtf_dbt_spark.functions import bq, text, vectors  # noqa: F401
