"""Sources: table readers + deterministic synthetic clip generation."""
