"""Parallel layer: device meshes, sharded search, multi-host streaming."""
