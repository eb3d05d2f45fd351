"""Cross-cutting runtime services (breakers, task management)."""
