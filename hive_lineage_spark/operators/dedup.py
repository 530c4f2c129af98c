from __future__ import annotations

QUERIES: dict = {}
ORACLES: dict = {}
