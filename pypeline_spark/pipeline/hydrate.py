"""Placeholder hydration: named-parameter substitution into SQL text.

The reference hydrates queries by raw ``str.replace`` of each
placeholder key with its value — injection-by-design, no validation
(ref: /root/reference/pypeline/Pype.py:170-177).  This version keeps the
same template surface but validates: placeholder keys must be
``{name}``-style tokens, values are stringified, and an unknown token
left in the query is an error instead of silently shipping to the
engine.  The vestigial ``offset`` suffix (ref: Pype.py:174-175 — dead
code, no caller passes it) maps to an explicit ``OFFSET n`` clause.
"""

from __future__ import annotations

import re
from typing import Mapping, Optional

_TOKEN = re.compile(r"\{([A-Za-z_][A-Za-z0-9_]*)\}")


class HydrationError(ValueError):
    """A placeholder referenced by the query was not provided."""


def hydrate_query(
    query: str,
    placeholders: Optional[Mapping[str, object]] = None,
    offset: Optional[int] = None,
) -> str:
    """Substitute ``{name}`` tokens; optionally append ``OFFSET n``.

    Unlike the reference (blind str.replace of arbitrary keys), tokens
    are explicit and unresolved tokens raise, so a typo'd placeholder
    fails at compile time rather than inside the engine.
    """
    placeholders = dict(placeholders or {})

    def sub(m: re.Match[str]) -> str:
        key = m.group(1)
        if key not in placeholders:
            raise HydrationError(f"unresolved placeholder {{{key}}} in query")
        return str(placeholders[key])

    out = _TOKEN.sub(sub, query)
    if offset is not None:
        out = f"{out} OFFSET {int(offset)}"
    return out
