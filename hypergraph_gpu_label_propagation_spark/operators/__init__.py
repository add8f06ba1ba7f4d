"""Relational operators of the engine (gather-scatter kernels, graph
algorithms, and training-data pipeline operators)."""
