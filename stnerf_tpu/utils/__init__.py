from .jax_setup import enable_compilation_cache, setup_logger

__all__ = ["enable_compilation_cache", "setup_logger"]
