"""Sources: deterministic synthetic generator + format-parameterized IO."""
