"""Shared utilities: types, constants, units, math, helpers, scheduler."""
