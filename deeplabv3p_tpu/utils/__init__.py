"""Utilities: class config, visualization, checkpointing, weight import."""
