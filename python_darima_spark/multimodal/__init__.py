"""Multimodal (image/audio/video) column handling: opaque binary payloads
with typed metadata, processed via Arrow-batched mapInPandas."""
