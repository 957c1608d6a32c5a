"""Checkpoint manifest: per-partition lineage + metrics records.

The reference has no checkpointing — a rerun redoes everything and
overwrites outputs (``/root/reference/ocr_router.py:403``,
``ollama_cloud_ocr.py:889``).  Here every completed partition commits a
JSON lineage record `{partition_id, input_file, input_fingerprint, docs,
spans_out, chars, errors, ocr latency stats, status}` (FIXTURES.md §4);
a killed job resumes by skipping partitions whose record matches the
current input fingerprint.

Commit protocol (resume atomicity, SURVEY.md §7.3): partition output is
written to ``_tmp-part-N`` and atomically renamed to ``part-N``; the
manifest record is written (tmp + rename) only after the data rename.
A kill at any point leaves either nothing or a complete partition.
"""

from __future__ import annotations

import hashlib
import json
import os


def partition_fingerprint(input_file: str) -> str:
    st = os.stat(input_file)
    key = f"{os.path.abspath(input_file)}:{st.st_size}:{st.st_mtime_ns}"
    return hashlib.sha256(key.encode()).hexdigest()[:16]


class Manifest:
    def __init__(self, output_dir: str):
        self.output_dir = output_dir
        self.dir = os.path.join(output_dir, "manifest")
        os.makedirs(self.dir, exist_ok=True)

    def _rec_path(self, pid: int) -> str:
        return os.path.join(self.dir, f"part-{pid:05d}.json")

    def part_dir(self, pid: int) -> str:
        return os.path.join(self.output_dir, f"part-{pid:05d}")

    def record(self, pid: int) -> dict | None:
        try:
            with open(self._rec_path(pid)) as f:
                return json.load(f)
        except (FileNotFoundError, json.JSONDecodeError):
            return None

    def is_done(self, pid: int, fingerprint: str) -> bool:
        rec = self.record(pid)
        return (
            rec is not None
            and rec.get("status") == "done"
            and rec.get("input_fingerprint") == fingerprint
            and os.path.isdir(self.part_dir(pid))
        )

    def commit(self, pid: int, record: dict) -> None:
        record = dict(record, partition_id=pid, status="done")
        tmp = self._rec_path(pid) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(record, f, indent=1)
        os.replace(tmp, self._rec_path(pid))

    def records(self) -> list[dict]:
        out = []
        for name in sorted(os.listdir(self.dir)):
            if name.endswith(".json"):
                with open(os.path.join(self.dir, name)) as f:
                    out.append(json.load(f))
        return out
