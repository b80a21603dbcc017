"""Index manifest: lineage, per-stage metrics, atomic commit, resume.

The reference's "ready" state is an in-RAM set mutated by a background
task (`/root/reference/src/bin/app/types.rs:11-22`,
`handlers/upload.rs:52-70`) — lost on restart, stuck forever on a hang.
Here readiness is durable: an index directory is ready iff
``manifest.json`` exists and says ``status: committed``; the manifest is
written tmp+rename (atomic on POSIX), and each stage directory carries
its own ``_STAGE_<name>.json`` with input lineage (fingerprint) and build
metrics (rows, bytes, wall_ms) so an interrupted build resumes by
skipping committed stages whose lineage matches (north-rule requirement:
per-partition lineage + metrics, idempotent resume).
"""

from __future__ import annotations

import hashlib
import json
import os
import time


FORMAT_VERSION = 1


def fingerprint(obj) -> str:
    """Deterministic fingerprint of a JSON-able lineage description."""
    blob = json.dumps(obj, sort_keys=True, default=str).encode()
    return hashlib.sha256(blob).hexdigest()[:16]


def atomic_write_json(path: str, payload: dict) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=2, sort_keys=True, default=str)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def dir_stats(path: str) -> dict:
    """rows/bytes metrics for a parquet stage directory (footer-only
    reads; recursive, so hive-partitioned spills report real numbers)."""
    import pyarrow.parquet as pq

    rows = 0
    nbytes = 0
    files = []
    for root, _dirs, names in sorted(os.walk(path)):
        for name in sorted(names):
            if not name.endswith(".parquet"):
                continue
            full = os.path.join(root, name)
            meta = pq.read_metadata(full)
            size = os.path.getsize(full)
            rows += meta.num_rows
            nbytes += size
            files.append({"file": os.path.relpath(full, path),
                          "rows": meta.num_rows, "bytes": size})
    return {"rows": rows, "bytes": nbytes, "files": files}


class StageCheckpoint:
    """Context for building one checkpointed stage directory.

    Usage::

        ck = StageCheckpoint(index_dir, "postings", lineage={...})
        if not ck.is_complete():
            ... write into ck.out_dir ...
            ck.commit(extra_metrics={...})
    """

    def __init__(self, index_dir: str, name: str, lineage: dict):
        self.name = name
        self.out_dir = os.path.join(index_dir, name)
        self.marker = os.path.join(index_dir, f"_STAGE_{name}.json")
        self.fp = fingerprint(lineage)
        self.lineage = lineage
        self._t0 = time.monotonic()

    def is_complete(self) -> bool:
        if not os.path.exists(self.marker):
            return False
        try:
            with open(self.marker) as f:
                entry = json.load(f)
        except (OSError, json.JSONDecodeError):
            return False
        if entry.get("fingerprint") != self.fp:
            return False
        return os.path.isdir(self.out_dir)

    def fresh_dir(self) -> str:
        """Clear any partial output from a crashed run and return out_dir."""
        import shutil

        if os.path.exists(self.out_dir):
            shutil.rmtree(self.out_dir)
        os.makedirs(self.out_dir, exist_ok=True)
        return self.out_dir

    def resume_dir(self) -> str:
        """Like fresh_dir, but KEEP existing partial output if it belongs
        to a crashed attempt of the SAME lineage (partition-granular
        resume: idempotent per-partition writers skip finished work).
        A `_PARTIAL_<name>.json` marker records the in-progress
        fingerprint; any mismatch wipes."""
        partial = os.path.join(
            os.path.dirname(self.marker), f"_PARTIAL_{self.name}.json"
        )
        keep = False
        if os.path.exists(partial) and os.path.isdir(self.out_dir):
            try:
                with open(partial) as f:
                    keep = json.load(f).get("fingerprint") == self.fp
            except (OSError, json.JSONDecodeError):
                keep = False
        if not keep:
            self.fresh_dir()
        atomic_write_json(partial, {"fingerprint": self.fp})
        self._partial_marker = partial
        os.makedirs(self.out_dir, exist_ok=True)
        return self.out_dir

    def commit(self, extra_metrics: dict | None = None) -> dict:
        metrics = dir_stats(self.out_dir) if os.path.isdir(self.out_dir) else {}
        entry = {
            "stage": self.name,
            "fingerprint": self.fp,
            "lineage": self.lineage,
            "metrics": {
                **metrics,
                **(extra_metrics or {}),
                "wall_ms": round((time.monotonic() - self._t0) * 1000, 1),
            },
        }
        atomic_write_json(self.marker, entry)
        partial = getattr(self, "_partial_marker", None)
        if partial and os.path.exists(partial):
            os.remove(partial)
        return entry


def load_stage_entry(index_dir: str, name: str) -> dict | None:
    marker = os.path.join(index_dir, f"_STAGE_{name}.json")
    if not os.path.exists(marker):
        return None
    with open(marker) as f:
        return json.load(f)


def commit_manifest(index_dir: str, payload: dict) -> None:
    payload = {"format_version": FORMAT_VERSION, "status": "committed",
               "committed_unix_ms": int(time.time() * 1000), **payload}
    atomic_write_json(os.path.join(index_dir, "manifest.json"), payload)


def load_manifest(index_dir: str) -> dict:
    path = os.path.join(index_dir, "manifest.json")
    with open(path) as f:
        m = json.load(f)
    if m.get("status") != "committed":
        raise ValueError(f"index at {index_dir} is not committed")
    return m


def is_ready(index_dir: str) -> bool:
    """The durable analog of the reference's GET /api/ready
    (`handlers/ready.rs:13-23`)."""
    try:
        load_manifest(index_dir)
        return True
    except (OSError, ValueError, json.JSONDecodeError):
        return False
