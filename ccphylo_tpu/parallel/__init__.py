"""Multi-chip parallel engines (mesh-sharded distance + join loops)."""
