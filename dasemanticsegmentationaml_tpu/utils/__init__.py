"""Utilities: torch checkpoint I/O, orbax train-state I/O, logging, config."""
