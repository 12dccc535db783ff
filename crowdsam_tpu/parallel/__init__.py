"""Multi-chip parallelism: device meshes and sharded pipelines."""
