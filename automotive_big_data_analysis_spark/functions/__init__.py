"""Reusable column-expression builders (JVM-side, codegen-friendly).

Everything here returns ``pyspark.sql.Column`` objects composed from
built-in functions — no Python UDFs in any hot path.
"""
