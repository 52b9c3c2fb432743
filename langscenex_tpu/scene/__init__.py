"""Scene representation: Gaussian state pytree, cameras, IO."""
