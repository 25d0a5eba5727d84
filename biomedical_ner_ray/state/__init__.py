"""Broadcast helpers and the per-partition manifest / resume layer."""
