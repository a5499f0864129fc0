from .normalize import normalize_text_udf

__all__ = ["normalize_text_udf"]
