"""Offline dataset tooling (reference tools/): taxonomy splits, tree-dist
cache warming, channel statistics. Run as ``python -m hvt.tools.<name>``."""
