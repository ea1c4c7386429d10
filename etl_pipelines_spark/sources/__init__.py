from etl_pipelines_spark.sources.registry import TABLES, load_table, register_testdata

__all__ = ["TABLES", "load_table", "register_testdata"]
