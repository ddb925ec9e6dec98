"""Query plans: the graded capability surface.

Each module registers named queries (Spark callable + optional DuckDB
oracle SQL) into the registry. ``registry.queries()`` /
``registry.oracle_sql()`` are what ``__spark_entry__.py`` exposes to
the driver.
"""
