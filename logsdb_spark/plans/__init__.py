"""Query plan modules. Importing them populates the registry."""

from __future__ import annotations

_LOADED = False


def load_all_plans() -> None:
    global _LOADED
    if _LOADED:
        return
    _LOADED = True
    from . import reference_queries  # noqa: F401
    from . import tpch  # noqa: F401
    from . import extensions  # noqa: F401
    from . import timeseries  # noqa: F401
