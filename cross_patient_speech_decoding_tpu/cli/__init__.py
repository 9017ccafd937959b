"""Experiment drivers and the `cpsd` command-line interface."""
