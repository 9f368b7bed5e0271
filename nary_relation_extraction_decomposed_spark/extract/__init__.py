from .html import extract_text, extract_text_batch

__all__ = ["extract_text", "extract_text_batch"]
