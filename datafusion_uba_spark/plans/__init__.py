from datafusion_uba_spark.plans.sql_macro import expand_macros, sql

__all__ = ["expand_macros", "sql"]
