"""Lensfun-format lens correction database."""
