"""Fitting layer: training loop, experiment store, config/grid machinery, eval."""
