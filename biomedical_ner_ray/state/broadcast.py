"""Broadcast-small-side helpers.

The reference's joins are all broadcast hash lookups against in-memory
dicts (SURVEY.md §2.4). In Ray the idiom is: ``ray.put`` the small side
once on the driver, hand the ObjectRef to actor constructors / stage
closures, and ``ray.get`` it once per actor in ``__init__`` — the object
lives once per node in the shared object store, never re-shipped per
batch.
"""

from __future__ import annotations

from typing import Any

import ray


def put_once(obj: Any) -> "ray.ObjectRef":
    return ray.put(obj)


def resolve(ref_or_obj: Any) -> Any:
    """Accept either an ObjectRef (distributed path) or the plain object
    (unit-test path) so stage classes are testable without a cluster."""
    if isinstance(ref_or_obj, ray.ObjectRef):
        return ray.get(ref_or_obj)
    return ref_or_obj
