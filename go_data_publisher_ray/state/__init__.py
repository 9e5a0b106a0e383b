"""Durable control-plane state: manifest log, checkpoints, atomic IO."""
