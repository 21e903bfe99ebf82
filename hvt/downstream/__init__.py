"""Transfer evaluation on frozen features: linear probe + SimpleShot."""
