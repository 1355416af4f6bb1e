"""Infra: registry, config system, logging, plotting, checkpointing."""
