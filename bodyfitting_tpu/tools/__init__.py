"""User-facing maintenance tools (asset validation, conversions)."""
