"""End-to-end Ray Data pipelines: index build, search, dedup, similarity,
text analysis, events windows, multimodal plumbing."""
