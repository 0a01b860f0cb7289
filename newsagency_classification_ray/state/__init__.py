"""Shared small-state helpers: broadcast objects, lineage manifests."""
