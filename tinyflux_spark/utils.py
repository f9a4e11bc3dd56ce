"""Public hashability helpers, reference-compatible.

The reference exposes ``tinyflux.utils.freeze`` / ``FrozenDict``
(reference utils.py:7-58) so query objects containing dicts can be
hashed and cached. This engine's query classes already implement their
own hashing contract (queries.py), but the helpers are part of the
public surface a drop-in user may import, so they ship here with the
same contract: ``freeze`` converts dict→FrozenDict, list→tuple,
set→frozenset recursively; ``FrozenDict`` is an immutable, hashable
dict that still compares equal to plain dicts.
"""

from __future__ import annotations

from typing import Any


class FrozenDict(dict):
    """A dict that refuses mutation and implements ``__hash__``.

    Subclasses ``dict`` so equality with ordinary dicts (and use as a
    mapping) is preserved; the hash is over the item set, so two equal
    dicts hash equal regardless of insertion order and without
    requiring keys of mutually comparable types.
    """

    def __hash__(self) -> int:  # type: ignore[override]
        return hash(frozenset(self.items()))

    def _blocked(self, *args: Any, **kwargs: Any) -> Any:
        raise TypeError("object is immutable")

    __setitem__ = _blocked
    __delitem__ = _blocked
    clear = _blocked
    pop = _blocked
    popitem = _blocked
    update = _blocked
    # stricter than the reference, which inherits the mutating
    # dict.setdefault — an immutability hole, not a behavior to match
    setdefault = _blocked


def freeze(obj: Any) -> Any:
    """Recursively convert ``obj`` into a hashable equivalent:
    dicts become :class:`FrozenDict`, lists become tuples, sets become
    frozensets; everything else passes through."""
    if isinstance(obj, dict):
        return FrozenDict((k, freeze(v)) for k, v in obj.items())
    if isinstance(obj, list):
        return tuple(freeze(x) for x in obj)
    if isinstance(obj, set):
        return frozenset(obj)
    return obj
