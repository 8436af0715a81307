"""Checkpoint conversion, IO, and misc host utilities."""
