from .textnorm import compact_form, normalize_surface, shingles
from .hashing import salt_expr, stable_id_expr

__all__ = [
    "compact_form",
    "normalize_surface",
    "shingles",
    "salt_expr",
    "stable_id_expr",
]
