"""Hyperparameter sweeps: quasi-random (Halton) and grid trial generation."""
