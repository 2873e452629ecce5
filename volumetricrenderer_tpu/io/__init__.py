"""Asset ingestion (mesh files -> TPU-friendly baked representations)."""
