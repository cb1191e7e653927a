"""Placeholder — populated in Phase 1+."""
