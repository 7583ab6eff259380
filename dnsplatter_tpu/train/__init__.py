"""Training engine: optimizers, densification strategy, trainer loop."""
