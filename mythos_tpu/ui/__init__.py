"""User-facing observability."""
