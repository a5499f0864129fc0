from .changelog import generate_changelog, write_feed

__all__ = ["generate_changelog", "write_feed"]
