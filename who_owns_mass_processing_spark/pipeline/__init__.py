"""End-to-end dedup pipeline: stages, checkpoint/resume, metrics."""
