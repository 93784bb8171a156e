"""Sidecar cache for bench legs, keyed by a hash of the measured code.

The driver's end-of-round `bench.py` run has a hard wall budget
(HAFF_BENCH_DEADLINE_SECS, default 460 s) while the axon tunnel's claim
plus ONE full-evaluate compile can eat most of it — three fresh graphs
(headline mask path + e2e batch 8 + p50 batch 1) do not reliably fit.

Every successful leg measurement (from bench.py's own legs or from
bench_e2e.py runs during the round) is persisted here keyed by a
content hash of the package + bench drivers. The final bench.py run
measures whatever fits its budget fresh and merges remaining legs from
the cache ONLY when the code hash matches, marking them
`<leg>_source: "cached"` so the artifact stays auditable (a fresh
measurement always overwrites a cached one). Content hashing (not git
sha) keeps cached legs valid across commits that do not touch the
measured code (e.g. the driver's end-of-round snapshot commit).
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Optional

_ROOT = os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))
_PATH = os.path.join(_ROOT, ".bench_cache.json")


def code_hash() -> str:
    """md5 over the package sources + bench drivers (sorted paths)."""
    h = hashlib.md5()
    files = []
    for base, _, names in os.walk(os.path.join(_ROOT, "haff_tpu")):
        if "__pycache__" in base:
            continue
        files.extend(os.path.join(base, n) for n in names
                     if n.endswith(".py"))
    files.extend(os.path.join(_ROOT, n)
                 for n in ("bench.py", "bench_e2e.py", "bench_train.py")
                 if os.path.exists(os.path.join(_ROOT, n)))
    for path in sorted(files):
        h.update(path.encode())
        try:
            with open(path, "rb") as f:
                h.update(f.read())
        except OSError:
            pass
    return h.hexdigest()


def _load() -> dict:
    try:
        with open(_PATH) as f:
            return json.load(f)
    except Exception:
        return {}


def store(leg: str, fields: dict) -> None:
    """Persist one leg's measured fields under the current code hash."""
    data = _load()
    key = code_hash()
    if data.get("code_hash") != key:
        data = {"code_hash": key}
    data[leg] = dict(fields)
    try:
        with open(_PATH, "w") as f:
            json.dump(data, f)
    except OSError:
        pass


def load(leg: str) -> Optional[dict]:
    """Return the leg's fields if cached at the CURRENT code, else None."""
    data = _load()
    if data.get("code_hash") != code_hash():
        return None
    return data.get(leg)
