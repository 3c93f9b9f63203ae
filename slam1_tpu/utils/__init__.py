"""Host-side utilities: data IO, evaluation, checkpointing, metrics."""
