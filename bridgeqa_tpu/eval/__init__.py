"""Evaluation: detection AP, QA metrics, prediction/scoring entry points."""
