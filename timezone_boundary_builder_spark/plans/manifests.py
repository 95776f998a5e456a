"""Checkpoint-resumable stages via content-fingerprint manifests.

Engine re-expression of the reference's FileCache / FileLookupCache
(reference util/cache.js:50-128): every expensive stage is keyed by an
md5 fingerprint of its logical inputs (config + upstream output hashes —
exactly how the reference keys zone builds on md5(op list with overpass
ids replaced by download-file hashes), index.js:806-826); on re-run, a
stage whose fingerprint matches the stored manifest AND whose output
still hash-verifies (the corruption guard of util/cache.js:108-126) is
skipped and its parquet output is reused.

No wall-clock ever enters a fingerprint — content only (determinism rule
from SURVEY.md §7 hard-part #5).
"""

from __future__ import annotations

import hashlib
import json
import os

from pyspark.sql import DataFrame, SparkSession


def fingerprint(*parts: str) -> str:
    h = hashlib.md5()
    for p in parts:
        h.update(p.encode())
        h.update(b"\x00")
    return h.hexdigest()


def _output_hash(path: str) -> str:
    """Hash of the stage output: file names + sizes of the parquet files
    (cheap, stable; the reference re-hashes output bytes — file-level
    stats are the columnar equivalent since parquet writes are atomic)."""
    h = hashlib.md5()
    for dirpath, _, files in sorted(os.walk(path)):
        for fn in sorted(files):
            if fn.startswith(("_", ".")):
                continue
            full = os.path.join(dirpath, fn)
            h.update(fn.encode())
            h.update(str(os.path.getsize(full)).encode())
    return h.hexdigest()


class StageManifest:
    """One manifest JSON per pipeline root: stage -> {fingerprint,
    output_path, output_hash}."""

    def __init__(self, root: str):
        self.root = root
        self.path = os.path.join(root, "_manifest.json")
        os.makedirs(root, exist_ok=True)
        self._data = {}
        if os.path.exists(self.path):
            with open(self.path) as f:
                self._data = json.load(f)

    def _save(self) -> None:
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self._data, f, indent=1)
        os.rename(tmp, self.path)

    def run_stage(
        self,
        spark: SparkSession,
        stage: str,
        fp: str,
        compute: "callable[[], DataFrame]",
    ) -> tuple[DataFrame, bool]:
        """Returns (df, was_cached). Skips compute when the stored
        fingerprint matches AND the output parquet re-verifies."""
        out_path = os.path.join(self.root, stage)
        rec = self._data.get(stage)
        if (
            rec
            and rec["fingerprint"] == fp
            and os.path.exists(out_path)
            and _output_hash(out_path) == rec["output_hash"]
        ):
            return spark.read.parquet(out_path), True
        df = compute()
        df.write.mode("overwrite").parquet(out_path)
        self._data[stage] = {
            "fingerprint": fp,
            "output_path": out_path,
            "output_hash": _output_hash(out_path),
        }
        self._save()
        return spark.read.parquet(out_path), False
