from . import cr_synthetic

__all__ = ["cr_synthetic"]
