"""map_batches stage bodies: extraction, posting build, codecs."""
