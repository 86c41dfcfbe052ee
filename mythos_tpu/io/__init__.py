"""Input/output: file-format parsers and writers (host-side, numpy-based)."""
