"""Persistent-state helpers: the filesystem seam for spills/checkpoints."""
