from . import deck

__all__ = ["deck"]
