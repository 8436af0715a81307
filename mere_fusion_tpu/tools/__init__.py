"""Offline tooling: avatar preparation, checkpoint conversion CLIs."""
