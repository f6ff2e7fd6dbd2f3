"""Sources & storage: synthetic WAL feed, manifest-based lake table, checkpoints."""
