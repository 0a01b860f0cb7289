"""Ray Data stage callables (stateless fns and actor-pool classes)."""
