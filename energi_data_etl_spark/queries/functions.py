"""Placeholder — queries land in Phase 2+."""
