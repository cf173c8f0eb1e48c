"""Evaluation metrics (rebuild of compare_gan/metrics/)."""
