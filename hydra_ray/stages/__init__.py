"""map_batches stage bodies (stateless functions and actor-pool classes)."""
