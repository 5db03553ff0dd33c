"""Lineage/metrics manifests and resume logic for pipeline stages."""
