"""Multi-chip parallelism: mesh construction and sharded training steps."""
