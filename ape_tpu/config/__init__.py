from .lazy import L, LazyCall, LazyConfig, ConfigDict, LazyNode, instantiate

__all__ = ["L", "LazyCall", "LazyConfig", "ConfigDict", "LazyNode", "instantiate"]
