"""Data layer: dataparsers, datasets, synthetic scenes, IO."""
