from .server import DEFAULT_PORT, main, predict, start_server

__all__ = ["DEFAULT_PORT", "main", "predict", "start_server"]
