"""Shared transaction machinery for persisted, versioned index artifacts
(the sharded-MV pattern factored out of ``operators/ann_index.PQIndex``
so every index family — PQ/IVF-PQ vectors, MinHash text signatures —
runs ONE tested implementation of the tricky parts):

- immutable artifact dirs under the index root (``seg=<id>``, ...);
- a JSON manifest per committed version naming the live artifact set;
- an atomic ``_LATEST`` pointer (``os.replace``) — readers always see a
  fully-written version or the previous one, never a torn state;
- a geometry descriptor (``_TABLE.json``) pinned for the index's
  lifetime: artifacts are meaningless under different geometry, so
  reopening with different parameters is a loud error;
- the stream replay guard: ``last_batch_id`` is a DEDICATED manifest
  field carried forward by every commit — the artifact version counter
  is internal bookkeeping, so a compact()/rebuild/delete() version can
  never shadow a genuine future micro-batch id (exactly-once under
  foreachBatch replay);
- pruning with a one-version grace window: reads are lazy DataFrames
  over artifact paths, so artifacts referenced by a just-evicted
  manifest survive until the NEXT commit's prune.

Subclasses provide the domain logic (what a segment contains, how to
build/search) plus ``_live_artifacts(manifest)`` naming the dir patterns
their manifests reference.
"""

from __future__ import annotations

import json
import os
import re
import shutil

from pyspark.sql import DataFrame


class VersionedSegmentStore:
    """Base class: version pointer + manifests + atomic writes + prune."""

    def __init__(self, index_dir: str, geometry: dict, keep_versions: int = 2):
        if keep_versions < 1:
            raise ValueError(f"keep_versions must be >= 1, got {keep_versions}")
        self.index_dir = index_dir
        self.keep_versions = keep_versions
        os.makedirs(index_dir, exist_ok=True)
        cfg_path = os.path.join(index_dir, "_TABLE.json")
        if os.path.exists(cfg_path):
            with open(cfg_path, encoding="ascii") as fh:
                cfg = json.load(fh)
            if cfg != geometry:
                raise ValueError(
                    f"{index_dir}: index was created with {cfg}, reopened "
                    f"with {geometry} — artifacts are meaningless under "
                    "different geometry"
                )
        else:
            tmp = cfg_path + ".tmp"
            with open(tmp, "w", encoding="ascii") as fh:
                json.dump(geometry, fh)
            os.replace(tmp, cfg_path)

    # -- version pointer + manifests ---------------------------------------

    @property
    def _pointer(self) -> str:
        return os.path.join(self.index_dir, "_LATEST")

    def latest_version(self) -> int | None:
        try:
            with open(self._pointer, encoding="ascii") as fh:
                return int(fh.read().strip())
        except FileNotFoundError:
            return None

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self.index_dir, f"manifest_v={version}.json")

    def _load_manifest(self, version: int) -> dict:
        with open(self._manifest_path(version), encoding="ascii") as fh:
            return json.load(fh)

    def _write_manifest(self, version: int, manifest: dict) -> None:
        tmp = self._manifest_path(version) + ".tmp"
        with open(tmp, "w", encoding="ascii") as fh:
            json.dump(manifest, fh)
        os.replace(tmp, self._manifest_path(version))

    def _commit(self, version: int) -> None:
        tmp = self._pointer + ".tmp"
        with open(tmp, "w", encoding="ascii") as fh:
            fh.write(str(version))
        os.replace(tmp, self._pointer)

    def versions(self) -> list[int]:
        return sorted(
            int(m.group(1))
            for name in os.listdir(self.index_dir)
            if (m := re.fullmatch(r"manifest_v=(-?\d+)\.json", name))
        )

    def _resolve_version(self, version: int | None) -> int:
        latest = self.latest_version()
        if latest is None:
            raise ValueError(
                f"{self.index_dir}: index has no committed version — run "
                "build() first"
            )
        if version is None:
            return latest
        if version > latest or not os.path.exists(self._manifest_path(version)):
            raise ValueError(
                f"{self.index_dir}: version {version} not available "
                f"(retained: {self.versions()})"
            )
        return version

    @staticmethod
    def _last_batch_id(manifest: dict, version: int) -> int:
        """The highest stream batch id applied as of ``manifest``.
        Pre-upgrade manifests (no ``last_batch_id`` field) used the
        artifact version AS the batch id, so the manifest's own version
        is the faithful legacy value."""
        return int(manifest.get("last_batch_id", version))

    # -- atomic artifact writes ---------------------------------------------

    def _write_dir(self, df: DataFrame, dst: str, partition_by=None) -> None:
        """Write to a staging dir, then atomically rename into place (a
        crashed earlier attempt at the same dst is discarded first — its
        version was never committed, so it is garbage by definition)."""
        staging = dst + ".staging"
        shutil.rmtree(staging, ignore_errors=True)
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(staging)
        if os.path.exists(dst):
            shutil.rmtree(dst)
        os.replace(staging, dst)

    # -- pruning -------------------------------------------------------------

    def _live_artifacts(self, manifest: dict) -> dict[str, set[int]]:
        """Subclass hook: dir-name regex pattern (one int group) -> the
        artifact ids this manifest keeps alive."""
        raise NotImplementedError

    def _prune(self, committed: int) -> None:
        """Drop manifests beyond the retained window, then any artifact
        dir no retained manifest references. Artifacts are retained for
        ONE version beyond the manifest window: reads are lazy
        DataFrames over the artifact paths, so a reader that resolved
        version V must survive a concurrent commit of V+1 evicting V
        from the manifest window — its files are only physically dropped
        at the commit AFTER that. Readers slower than one full commit
        interval still race deletion; hold a version= pin and
        materialize promptly, or raise keep_versions."""
        manifest_ids = sorted(
            (
                int(m.group(1))
                for name in os.listdir(self.index_dir)
                if (m := re.fullmatch(r"manifest_v=(-?\d+)\.json", name))
            ),
            reverse=True,
        )
        retained = [i for i in manifest_ids if i <= committed][
            : self.keep_versions
        ]
        # grace window: artifacts referenced by one extra (just-evicted)
        # manifest stay on disk until the NEXT commit's prune
        grace = [i for i in manifest_ids if i <= committed][
            : self.keep_versions + 1
        ]
        live: dict[str, set[int]] = {}
        for mid in grace:
            try:
                man = self._load_manifest(mid)
            except FileNotFoundError:
                continue  # evicted manifest already removed at a prior prune
            for pat, ids in self._live_artifacts(man).items():
                live.setdefault(pat, set()).update(ids)
        for mid in manifest_ids:
            if mid < committed and mid not in retained:
                try:
                    os.remove(self._manifest_path(mid))
                except FileNotFoundError:
                    pass
        for name in os.listdir(self.index_dir):
            for pat, keep in live.items():
                m = re.fullmatch(pat, name)
                if m and int(m.group(1)) < committed and int(m.group(1)) not in keep:
                    shutil.rmtree(
                        os.path.join(self.index_dir, name), ignore_errors=True
                    )
