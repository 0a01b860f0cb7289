"""End-to-end Ray Data pipelines (flagship KG construction + graph write)."""
