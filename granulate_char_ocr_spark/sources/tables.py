"""Input snapshot identity for lineage (SURVEY §7 R3 Iceberg fallback).

With Iceberg jars present, ``input_snapshot_id`` is
``table.currentSnapshot().snapshotId()``. In the parquet-only sandbox, the
equivalent commitment is a manifest hash: xxhash64 over the sorted
(path, size, mtime) listing of the input files — any file added, replaced
or rewritten changes the id, so lineage rows pin exactly what was read.
"""

from __future__ import annotations

import os


def manifest_snapshot_id(path: str) -> str:
    """Deterministic snapshot id for a parquet file/directory input."""
    entries = []
    if os.path.isfile(path):
        st = os.stat(path)
        entries.append((path, st.st_size, int(st.st_mtime)))
    else:
        for dirpath, _dirs, files in os.walk(path):
            for fn in sorted(files):
                if fn.startswith(("_", ".")):
                    continue  # _SUCCESS, hidden CRCs
                full = os.path.join(dirpath, fn)
                st = os.stat(full)
                entries.append(
                    (os.path.relpath(full, path), st.st_size, int(st.st_mtime))
                )
    entries.sort()
    # FNV-style 64-bit rolling hash over the manifest (no hashlib needed,
    # stable across runs and platforms)
    h = 0xCBF29CE484222325
    for rel, size, mtime in entries:
        for token in (rel, str(size), str(mtime)):
            for b in token.encode():
                h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return f"manifest:{h:016x}:{len(entries)}"
