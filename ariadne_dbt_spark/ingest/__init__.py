"""Artifact ingestion: dbt manifest / catalog / run_results → typed index
DataFrames."""
