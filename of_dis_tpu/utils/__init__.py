"""Timing, logging, evaluation utilities."""
