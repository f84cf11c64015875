"""End-to-end pipelines: layered batch ETL and helpers."""
