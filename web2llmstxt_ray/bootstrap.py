"""Import bootstrap for entry points invoked from arbitrary cwds.

Two failure modes when the repo is not on the ambient python path:

1. the DRIVER can't ``import web2llmstxt_ray`` — fixed by a sys.path
   insert (entry scripts do this themselves before importing us);
2. Ray WORKER processes can't import it either, so actor classes and
   closures pickled *by reference* fail to deserialize. Workers
   inherit ``PYTHONPATH`` from the environment at ``ray.init`` time, so
   exporting it BEFORE init fixes workers spawned later; and
   registering the package for cloudpickle pickle-by-value makes
   shipped code self-contained even when Ray was initialised earlier
   by someone else (the round driver's contract).

Call :func:`ensure_worker_importable` before ``ray.init`` when
possible; it is also safe (and still useful, via pickle-by-value)
after init.
"""

from __future__ import annotations

import os
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def ensure_worker_importable() -> str:
    """Export the repo root to PYTHONPATH (future Ray workers) and
    register the package for pickle-by-value (already-running Ray).
    Returns the repo root. Idempotent."""
    if _REPO_ROOT not in sys.path:
        sys.path.insert(0, _REPO_ROOT)
    parts = os.environ.get("PYTHONPATH", "").split(os.pathsep)
    if _REPO_ROOT not in parts:
        os.environ["PYTHONPATH"] = os.pathsep.join(
            [_REPO_ROOT] + [p for p in parts if p])
    try:
        import web2llmstxt_ray
        from ray import cloudpickle

        cloudpickle.register_pickle_by_value(web2llmstxt_ray)
    except Exception:  # pragma: no cover - older cloudpickle
        pass
    return _REPO_ROOT
