"""Runnable entry-point jobs (the reference's `src/jobs/` surface)."""
