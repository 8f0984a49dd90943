from . import lie, projective, scatter, corr, graph

__all__ = ["lie", "projective", "scatter", "corr", "graph"]
