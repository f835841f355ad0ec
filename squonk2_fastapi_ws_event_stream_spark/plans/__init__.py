"""Relational query plans over the test tables (SURVEY §2.11 surface).

Each module exports ``QUERIES: dict[name, fn(spark, sf_dir) -> DataFrame]``
and ``ORACLES: dict[name, sql]`` (DuckDB-runnable ANSI SQL).
"""
