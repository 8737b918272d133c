"""Plan-inspection helpers."""
