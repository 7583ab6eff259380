"""Model layer: Gaussian state, the DN-Splatter model, losses,
regularization strategies, metrics, and the densify/cull strategy."""
