"""Host-side utilities: phase timing/profiling, block checkpointing."""
