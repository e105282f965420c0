from .materialize import materialize_changelog

__all__ = ["materialize_changelog"]
