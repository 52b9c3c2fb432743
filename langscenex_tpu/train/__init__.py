"""Field-construction training: optimizer, densification, train loop."""
