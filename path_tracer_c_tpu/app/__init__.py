"""Driver: CLI for offline render, animation sweeps, inverse rendering."""
