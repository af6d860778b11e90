"""TableIO — snapshot-committed table storage behind one seam (SURVEY.md §7.5).

The north_rule mandates Iceberg tables; the Iceberg Spark runtime jar is not
resolvable in this sandbox, so the primary implementation is a
snapshot-directory Parquet layout with an atomically-replaced JSON manifest
emulating Iceberg's commit semantics:

* every crawl generation commits by (1) writing new Parquet directories,
  (2) atomically replacing ``manifest.json`` (write-tmp + ``os.replace``);
* a crash mid-generation leaves orphan directories that the manifest never
  references — the generation simply re-runs (all writes are idempotent
  recomputes, SURVEY.md §1.3);
* resume = read the manifest and continue from its recorded generation —
  the Iceberg analogue of reading the latest committed snapshot.

On a real cluster, set ``spark.sql.catalog.*`` for Iceberg and swap
:class:`SnapshotStore` for MERGE INTO / snapshot reads; the engine only
talks to this interface.
"""

from __future__ import annotations

import json
import os
import shutil


class SnapshotStore:
    """Directory layout::

        root/manifest.json          committed state (atomic replace)
        root/frontier/gen-N/        frontier snapshot after generation N-1
        root/crawled/gen-N/         pages crawled IN generation N (append-only)
        root/metrics.jsonl          per-generation metrics (rewritten on commit)
    """

    def __init__(self, spark, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- manifest ---------------------------------------------------------

    def _manifest_path(self) -> str:
        return os.path.join(self.root, "manifest.json")

    def read_manifest(self) -> dict | None:
        try:
            with open(self._manifest_path()) as f:
                return json.load(f)
        except FileNotFoundError:
            return None

    def commit(self, generation: int, metrics: list[dict],
               frontier_empty: bool, crawled_gens: list[int]) -> None:
        manifest = {
            "format_version": 1,
            "generation": generation,
            "frontier_empty": frontier_empty,
            "crawled_generations": crawled_gens,
        }
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, self._manifest_path())  # the atomic commit point
        with open(os.path.join(self.root, "metrics.jsonl"), "w") as f:
            for m in metrics:
                f.write(json.dumps(m) + "\n")

    def read_metrics(self) -> list[dict]:
        try:
            with open(os.path.join(self.root, "metrics.jsonl")) as f:
                return [json.loads(line) for line in f if line.strip()]
        except FileNotFoundError:
            return []

    # -- tables -----------------------------------------------------------

    def _gen_dir(self, table: str, gen: int) -> str:
        return os.path.join(self.root, table, f"gen-{gen}")

    def write_gen(self, df, table: str, gen: int) -> None:
        df.write.mode("overwrite").parquet(self._gen_dir(table, gen))

    def read_gen(self, table: str, gen: int):
        return self.spark.read.parquet(self._gen_dir(table, gen))

    def read_crawled(self, gens: list[int]):
        """Union of committed crawled generations (manifest-scoped read —
        orphan dirs from crashed generations are invisible)."""
        if not gens:
            return None
        paths = [self._gen_dir("crawled", g) for g in gens]
        return self.spark.read.parquet(*paths)

    def drop_uncommitted(self, table: str, committed: list[int]) -> None:
        tdir = os.path.join(self.root, table)
        if not os.path.isdir(tdir):
            return
        keep = {f"gen-{g}" for g in committed}
        for name in os.listdir(tdir):
            if name.startswith("gen-") and name not in keep:
                shutil.rmtree(os.path.join(tdir, name), ignore_errors=True)
