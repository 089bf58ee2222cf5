"""End-to-end ETL parity pipeline (reference dag.py re-expressed Spark-first)."""
