"""Execution plans: the dbt-style model executor (surface B) and the
data-quality test compiler."""
