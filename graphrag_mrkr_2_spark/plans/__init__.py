"""End-to-end pipeline composition and checkpoint/resume plans."""
