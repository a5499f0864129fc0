from .dedup_changelog import last_image_wins

__all__ = ["last_image_wins"]
