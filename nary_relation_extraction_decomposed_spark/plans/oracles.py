"""DuckDB oracle SQL twins for plans/queries.py (ANSI SQL, DuckDB 1.0).

Tables pre-registered as views by the driver: region nation customer
supplier part orders lineitem events documents embeddings.
"""

from __future__ import annotations

ORACLES: dict[str, str] = {}
