"""Vector-store naming + catalog (SURVEY.md §2.1 S12, §2.2 K3/K5).

The reference names one Oracle table per (alias, model, chunk_size,
chunk_overlap, distance_metric, index_type) combo and registers it in a
catalog by writing a ``COMMENT ON TABLE ... 'GENAI: {json}'`` (reference:
src/common/functions.py:47-75, src/server/utils/embedding.py:43-58,370-373).

Spark-first equivalent: same naming function; catalog = table properties
(``TBLPROPERTIES('genai'='{json}')``) on catalog tables, with a plain
directory-of-parquet layout (a ``_genai.json`` sidecar) as the no-metastore
fallback so the engine works against bare object storage too.
"""

from __future__ import annotations

import json
import math
import os
import re
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

GENAI_PROP = "genai"
SIDECAR = "_genai.json"


@dataclass
class VectorStorage:
    """Mirrors the reference's DatabaseVectorStorage (src/common/schema.py:25-35)."""

    vector_store: str = ""
    alias: str = ""
    model: str = ""
    chunk_size: int = 0
    chunk_overlap: int = 0
    distance_metric: str = "COSINE"
    index_type: str = "HNSW"
    extra: dict = field(default_factory=dict)


def get_vs_table(
    model: str,
    chunk_size: int,
    chunk_overlap: int,
    distance_metric: str,
    index_type: str = "HNSW",
    alias: str | None = None,
) -> tuple[str, str]:
    """Vector-store table name + catalog JSON, matching the reference's
    naming exactly (src/common/functions.py:47-75): ceil the overlap,
    join params with '_', upper-case, and map every non-word char to '_'.
    """
    overlap_ceil = math.ceil(chunk_overlap)
    parts = f"{model}_{chunk_size}_{overlap_ceil}_{distance_metric}_{index_type}"
    if alias:
        parts = f"{alias}_{parts}"
    table_name = re.sub(r"\W", "_", parts.upper())
    comment = json.dumps(
        {
            "alias": alias,
            "model": model,
            "chunk_size": chunk_size,
            "chunk_overlap": overlap_ceil,
            "distance_metric": distance_metric,
            "index_type": index_type,
        }
    )
    return table_name, comment


class VectorStoreCatalog:
    """Discover/register vector stores.

    Two backends, chosen per call:
      - metastore tables: ``CREATE TABLE ... TBLPROPERTIES('genai'=...)``;
        discovery scans ``spark.catalog.listTables()`` and filters on the
        property — the Spark analogue of the reference's
        ``all_tab_comments JOIN all_tables`` + ``LIKE 'GENAI:%'`` scan (J1).
      - directory backend: parquet dir per store + ``_genai.json`` sidecar;
        works on bare object storage with no metastore.
    """

    def __init__(self, spark: SparkSession, root: str | None = None):
        self.spark = spark
        self.root = root

    # -- directory backend -------------------------------------------------
    def _store_path(self, name: str) -> str:
        if not self.root:
            raise ValueError("directory backend requires a root path")
        # the name becomes a directory component and reaches drop_store's
        # rmtree — and it arrives RAW off the wire (DELETE /v1/embed/{vs}),
        # so '..', separators, or an absolute path would read or
        # recursively DELETE outside the catalog root
        if (
            not name
            or name in (".", "..")
            or "/" in name
            or "\\" in name
            or os.path.isabs(name)
        ):
            raise KeyError(f"invalid vector store name {name!r}")
        return os.path.join(self.root, name)

    def write_store(self, df: DataFrame, vs: VectorStorage, mode: str = "overwrite") -> str:
        """Persist a vector store DataFrame + its catalog entry (K1/K5).

        Appends are dimension-checked against the existing store: a write
        from the wrong embedding model corrupts every subsequent distance
        scan SILENTLY (cosine over mixed dims just throws at query time, or
        worse, zip_with truncates) — fail at write time instead."""
        name, comment = get_vs_table(
            vs.model, vs.chunk_size, vs.chunk_overlap, vs.distance_metric, vs.index_type, vs.alias
        )
        path = self._store_path(name)
        sidecar_path = os.path.join(path, SIDECAR)
        have_dim = None
        if mode == "append" and os.path.isdir(path) and "embedding" in df.columns:
            from pyspark.sql import functions as F

            # dim cached in the sidecar at create time (below) — no store
            # scan per append; legacy or ABSENT sidecars (e.g. a store built
            # by a streaming append that never wrote one) fall back to a
            # 1-row store read: gating the whole guard on the sidecar's
            # existence would wave the wrong-model append straight through
            # and then certify the corruption with a freshly-written sidecar
            if os.path.isfile(sidecar_path):
                with open(sidecar_path) as fh:
                    meta = json.load(fh)
                have_dim = meta.get("dim")
            if have_dim is None:
                have = self.read_store(name).select(F.size("embedding").alias("d")).first()
                have_dim = None if have is None else have["d"]
            # one-row probe of the incoming frame: runs ONE task of the
            # upstream plan (lazy — not the full pipeline); the corruption a
            # wrong-model append causes is worth one task per append
            new_row = df.select(F.size("embedding").alias("d")).first()
            if have_dim is not None and new_row is not None and have_dim != new_row["d"]:
                raise ValueError(
                    f"append dim mismatch for {name}: store has {have_dim}-dim "
                    f"embeddings, append has {new_row['d']} — wrong embed model?"
                )
        df.write.mode(mode).parquet(path)
        meta = json.loads(comment)
        if "embedding" in df.columns:
            if mode == "append" and have_dim is not None:
                meta["dim"] = int(have_dim)
            else:
                from pyspark.sql import functions as F

                # read the dim back from the files just written — cheap
                # 1-row parquet read, never a re-run of df's plan
                row = self.spark.read.parquet(path).select(F.size("embedding").alias("d")).first()
                if row is not None:
                    meta["dim"] = int(row["d"])
        with open(sidecar_path, "w") as fh:
            fh.write(json.dumps(meta))
        return name

    def read_store(self, name: str) -> DataFrame:
        return self.spark.read.parquet(self._store_path(name))

    def list_stores(self) -> list[VectorStorage]:
        """Catalog scan (S12): every store dir with a genai sidecar."""
        out: list[VectorStorage] = []
        if not self.root or not os.path.isdir(self.root):
            return out
        for entry in sorted(os.listdir(self.root)):
            sidecar = os.path.join(self.root, entry, SIDECAR)
            if os.path.isfile(sidecar):
                with open(sidecar) as fh:
                    meta = json.load(fh)
                out.append(
                    VectorStorage(
                        vector_store=entry,
                        alias=meta.get("alias") or "",
                        model=meta.get("model", ""),
                        chunk_size=meta.get("chunk_size", 0),
                        chunk_overlap=meta.get("chunk_overlap", 0),
                        distance_metric=meta.get("distance_metric", "COSINE"),
                        index_type=meta.get("index_type", "HNSW"),
                    )
                )
        return out

    def _recover_swap(self, path: str) -> None:
        """Crash recovery for the write -> rename -> rename -> rmtree swap
        used by compaction and Z-order rewrites: a kill between the two
        renames leaves the data under ``__old`` with the store path missing
        (restore it), and any leftover temp/old dirs from other crash points
        are removed — a stale ``__old`` would otherwise make every later
        swap's first rename fail forever."""
        import shutil

        old = path + "__old"
        if not os.path.isdir(path) and os.path.isdir(old):
            os.rename(old, path)
        for suffix in ("__old", "__compacting", "__zordering"):
            leftover = path + suffix
            if os.path.isdir(leftover):
                shutil.rmtree(leftover)

    def _swap_rewrite(self, path: str, tmp_suffix: str, write_fn) -> None:
        """Shared rewrite-and-swap for compaction and Z-order: recover any
        prior crash, rewrite through ``write_fn(df, tmp_path)``, swap via
        two renames, then RESCUE parquet files a concurrent appender
        committed after this rewrite's read — the read's own file listing
        (df.inputFiles()) is the exclusion set, so a rescued file can never
        also be inside the rewritten output (no double-sweep). The rescue
        preserves relative subpaths, so hive-partitioned appends land back
        in their partition dirs. Maintenance is still expected to run when
        ingest is quiesced (the reference's nightly model); the rescue turns
        a violated assumption into zero data loss instead of silent loss."""
        import shutil
        from urllib.parse import urlparse

        self._recover_swap(path)
        df = self.spark.read.parquet(path)
        read_files = {
            os.path.relpath(urlparse(f).path or f, path) for f in df.inputFiles()
        }
        tmp = path + tmp_suffix
        write_fn(df, tmp)
        old = path + "__old"
        os.rename(path, old)
        os.rename(tmp, path)
        for dp, _dirs, fs in os.walk(old):
            for f in fs:
                if not f.endswith(".parquet"):
                    continue
                rel = os.path.relpath(os.path.join(dp, f), old)
                if rel in read_files:
                    continue
                dest = os.path.join(path, rel)
                os.makedirs(os.path.dirname(dest), exist_ok=True)
                if os.path.exists(dest):
                    # basename collision with a rewritten output file (e.g.
                    # both sides used part-00000-...): skipping would silently
                    # drop the concurrently-appended rows when __old is
                    # rmtree'd below — rename with a unique suffix instead
                    stem, ext = os.path.splitext(dest)
                    dest = f"{stem}-rescued-{uuid.uuid4().hex[:8]}{ext}"
                os.rename(os.path.join(old, rel), dest)
        shutil.rmtree(old)

    def compact_store(self, name: str, target_file_mb: int = 128) -> int:
        """Small-file compaction (100 TB maintenance): streaming ingest
        (streaming/ingest.py) appends a few files per micro-batch, and a
        store accumulates thousands of tiny parquet files whose per-file
        open/footer cost dominates scans. Rewrite to ceil(bytes/target) files
        sized for the scanner (default 128 MB ~ one scan partition), swap
        atomically via rename, keep the sidecar. Returns the new file count.

        On a real object store this is the same pattern as Delta OPTIMIZE /
        Iceberg rewrite_data_files; here it is an explicit operator so the
        parquet-dir backend stays dependency-free.
        """
        path = self._store_path(name)
        self._recover_swap(path)
        sidecar_path = os.path.join(path, SIDECAR)
        with open(sidecar_path) as fh:
            comment = fh.read()
        total_bytes = sum(
            os.path.getsize(os.path.join(dp, f))
            for dp, _, fs in os.walk(path)
            for f in fs
            if f.endswith(".parquet")
        )
        n_files = max(1, -(-total_bytes // (target_file_mb * 1024 * 1024)))
        # hive-partitioned layout (e.g. an IVF centroid=N store) must keep
        # its partitioning through the rewrite — a flat rewrite would
        # silently destroy the pruning the index depends on
        part_cols = sorted(
            {d.split("=", 1)[0] for d in os.listdir(path)
             if "=" in d and os.path.isdir(os.path.join(path, d))}
        )

        def write_fn(df, tmp):
            if part_cols:
                (df.repartition(int(n_files), *part_cols)
                   .write.mode("overwrite").partitionBy(*part_cols).parquet(tmp))
            else:
                df.repartition(int(n_files)).write.mode("overwrite").parquet(tmp)

        self._swap_rewrite(path, "__compacting", write_fn)
        with open(os.path.join(path, SIDECAR), "w") as fh:
            fh.write(comment)
        return int(n_files)

    def maintain_store(
        self,
        name: str,
        target_file_mb: int = 128,
        zorder_cols: list[str] | None = None,
        rebuild_ivf: bool = False,
        n_centroids: int = 16,
    ) -> dict:
        """One maintenance pass over a store — the nightly job a continuous
        ingest needs: EITHER Z-order re-clustering (which sizes and compacts
        its own output — running the round-robin compactor afterwards would
        shuffle the clustering straight back out of the files) OR small-file
        compaction, plus an optional IVF index rebuild beside the store (the
        refit counterpoint to streaming append_partitioned, for when drift
        accumulates). Returns what ran. Each step is one distributed
        rewrite; nothing row-sized touches the driver."""
        report: dict = {}
        path = self._store_path(name)
        part_cols = sorted(
            {d.split("=", 1)[0] for d in os.listdir(path)
             if "=" in d and os.path.isdir(os.path.join(path, d))}
        )
        if zorder_cols:
            if part_cols:
                raise ValueError(
                    f"store {name} is hive-partitioned on {part_cols}; a flat "
                    "Z-order rewrite would destroy the layout its index prunes "
                    "against — compact (partition-preserving) or rebuild the "
                    "index instead"
                )
            from oaim_sandbox_spark.operators.relational import zorder_write

            self._recover_swap(path)
            with open(os.path.join(path, SIDECAR)) as fh:
                comment = fh.read()
            total_bytes = sum(
                os.path.getsize(os.path.join(dp, f))
                for dp, _, fs in os.walk(path)
                for f in fs
                if f.endswith(".parquet")
            )
            n_files = max(1, -(-total_bytes // (target_file_mb * 1024 * 1024)))
            self._swap_rewrite(
                path, "__zordering",
                lambda df, tmp: zorder_write(df, tmp, zorder_cols, n_files=int(n_files)),
            )
            with open(os.path.join(path, SIDECAR), "w") as fh:
                fh.write(comment)
            report["zordered_on"] = list(zorder_cols)
            report["n_files"] = int(n_files)
        else:
            report["n_files"] = self.compact_store(name, target_file_mb=target_file_mb)
        if rebuild_ivf:
            from oaim_sandbox_spark.operators.ann import IVFIndex

            store = self.read_store(name)
            index_path = self._store_path(name) + "_ivf"
            IVFIndex(n_centroids=n_centroids, seed=42).fit(store).write_partitioned(
                store, index_path, compact=True
            )
            report["ivf_index"] = index_path
        return report

    # -- tier-guard verdict cache ------------------------------------------
    def store_fingerprint(self, name: str) -> str:
        """Content-version fingerprint of a store: hash of the sorted
        (relative path, size) listing of its parquet files. Any append,
        overwrite, compaction, or Z-order rewrite changes the listing, so
        a cached per-store verdict keyed on this fingerprint invalidates
        exactly when the store's contents could have changed — without
        requiring every writer (streaming appends included) to bump an
        explicit version counter."""
        import hashlib

        path = self._store_path(name)
        entries = sorted(
            (os.path.relpath(os.path.join(dp, f), path), os.path.getsize(os.path.join(dp, f)))
            for dp, _dirs, fs in os.walk(path)
            for f in fs
            if f.endswith(".parquet")
        )
        return hashlib.sha256(json.dumps(entries).encode()).hexdigest()[:16]

    def tier_verdicts(
        self,
        name: str,
        tiers: list[str] | None = None,
        floor: float | None = None,
        k: int = 10,
        refresh: bool = False,
        id_col: str = "id",
        vec_col: str = "embedding",
        **probe_kwargs,
    ) -> dict[str, dict]:
        """Cached `tier_guard.recommend_tiers` for a catalog store: the
        10-19s sampled recall probe runs ONCE per (store version, floor, k)
        and the verdict JSON is persisted in the `_genai.json` sidecar (the
        K5 comment/properties machinery), so serving paths consult it at
        sidecar-read cost. Re-probes only when the store fingerprint
        changes (append/rewrite), the floor/k differ, a requested tier has
        no cached verdict yet, or `refresh=True`."""
        from oaim_sandbox_spark.operators import tier_guard as TG

        floor = TG.DEFAULT_FLOOR if floor is None else floor
        want = list(TG.TIER_LADDER) if tiers is None else list(tiers)
        for t in want:
            if t not in TG.TIER_LADDER:
                raise ValueError(f"unknown tier {t!r}; one of {sorted(TG.TIER_LADDER)}")
        fp = self.store_fingerprint(name)
        sidecar_path = os.path.join(self._store_path(name), SIDECAR)
        meta: dict = {}
        if os.path.isfile(sidecar_path):
            with open(sidecar_path) as fh:
                meta = json.load(fh)
        cached = meta.get("tier_guard")
        # verdicts are cached PER full probe configuration under one
        # fingerprint: a serving gate at the default floor and an offline
        # job at a stricter one must not thrash each other's cache (each
        # probe is 10-19s). The key folds in EVERY parameter that changes
        # what the probe measures — floor/k plus id/vec columns and any
        # probe_kwargs (n_queries, store_cap, metric, ...) — so a verdict
        # probed under a small store_cap is never silently served to a
        # request with a different configuration (ADVICE r8 low). Kwargs
        # explicitly passed AT their recommend_tiers default are
        # NORMALIZED OUT (review r9: the recommended gate wiring always
        # forwards metric='COSINE', which would otherwise fork a second
        # slot and re-pay the probe for a semantically identical config),
        # so default-config keys stay "floor|k" and existing sidecars
        # remain valid.
        from oaim_sandbox_spark.operators import tier_guard as _TG

        probe_defaults = _TG.PROBE_DEFAULTS
        sentinel = object()
        extras = {
            k2: probe_kwargs[k2]
            for k2 in sorted(probe_kwargs)
            if probe_defaults.get(k2, sentinel) != probe_kwargs[k2]
        }
        if id_col != "id":
            extras["id_col"] = id_col
        if vec_col != "embedding":
            extras["vec_col"] = vec_col
        cfg_key = f"{floor}|{k}"
        if extras:
            cfg_key += "|" + json.dumps(extras, sort_keys=True, default=str)
        fp_valid = cached is not None and cached.get("fingerprint") == fp
        configs = dict(cached.get("configs", {})) if fp_valid else {}
        have = configs.get(cfg_key, {})
        if not refresh and all(t in have for t in want):
            return {t: have[t] for t in want}
        probe = [t for t in want if refresh or t not in have]
        fresh = TG.recommend_tiers(
            self.read_store(name), tiers=probe, k=k, floor=floor,
            id_col=id_col, vec_col=vec_col, **probe_kwargs,
        )
        merged = {**have, **fresh}
        configs[cfg_key] = merged
        meta["tier_guard"] = {"fingerprint": fp, "configs": configs}
        with open(sidecar_path, "w") as fh:
            fh.write(json.dumps(meta))
        return {t: merged[t] for t in want}

    def assert_tier_usable(self, name: str, tier: str, floor: float | None = None, **kw) -> dict:
        """Enforcing form of the cached verdict — same contract as
        `tier_guard.assert_tier_usable` (raises on a refused tier) but
        zero probe cost once the verdict is cached for this store version."""
        verdict = self.tier_verdicts(name, tiers=[tier], floor=floor, **kw)[tier]
        if verdict["status"] == "refused":
            from oaim_sandbox_spark.operators import tier_guard as TG

            floor_v = TG.DEFAULT_FLOOR if floor is None else floor
            raise ValueError(
                f"tier {tier!r} refused for store {name!r}: sampled recall@10 "
                f"{verdict['recall']} (widened: {verdict['widened_recall']}) is below "
                f"the {floor_v} floor — its distribution assumption does not hold for "
                f"these embeddings; use int8/pca16_rerank or the exact path"
            )
        return verdict

    def drop_store(self, name: str) -> None:
        """K3 drop: remove data + catalog entry + any derived IVF index
        (maintain_store(rebuild_ivf=True) writes it beside the store as
        '<name>_ivf'; leaving it behind orphans disk and, worse, serves a
        STALE index if the store is later recreated under the same name)."""
        import shutil

        path = self._store_path(name)
        if os.path.isdir(path):
            shutil.rmtree(path)
        ivf = path + "_ivf"
        if os.path.isdir(ivf):
            shutil.rmtree(ivf)

    # -- metastore backend -------------------------------------------------
    def register_table(self, table: str, comment: str) -> None:
        """K5: attach the genai catalog JSON as a table property. The table
        name is interpolated into SQL, so it must be a plain identifier
        (get_vs_table only emits [A-Z0-9_]); the property value escapes
        BACKSLASHES as well as quotes — Spark's single-quoted literals eat
        backslash escapes, and a model name like 'a\\b' would otherwise
        store invalid JSON that breaks every later list_tables."""
        if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", table):
            raise ValueError(f"invalid table identifier {table!r}")
        escaped = comment.replace("\\", "\\\\").replace("'", "''")
        self.spark.sql(f"ALTER TABLE {table} SET TBLPROPERTIES ('{GENAI_PROP}'='{escaped}')")

    def list_tables(self) -> list[VectorStorage]:
        """S12 via metastore: listTables + property filter (J1 analogue).
        A table whose genai property is unreadable or corrupt is SKIPPED,
        never allowed to break the whole catalog listing."""
        out: list[VectorStorage] = []
        for t in self.spark.catalog.listTables():
            try:
                props = self.spark.sql(f"SHOW TBLPROPERTIES {t.name}").collect()
            except Exception:
                continue
            for row in props:
                if row["key"] == GENAI_PROP:
                    try:
                        meta = json.loads(row["value"])
                    except (json.JSONDecodeError, TypeError):
                        continue  # corrupt property: skip this table
                    out.append(
                        VectorStorage(
                            vector_store=t.name,
                            alias=meta.get("alias") or "",
                            model=meta.get("model", ""),
                            chunk_size=meta.get("chunk_size", 0),
                            chunk_overlap=meta.get("chunk_overlap", 0),
                            distance_metric=meta.get("distance_metric", "COSINE"),
                            index_type=meta.get("index_type", "HNSW"),
                        )
                    )
        return out


def filter_catalog(
    stores: list[VectorStorage],
    alias: str | None = None,
    model: str | None = None,
    chunk_size: int | None = None,
    chunk_overlap: int | None = None,
    distance_metric: str | None = None,
    index_type: str | None = None,
) -> list[VectorStorage]:
    """Faceted catalog filter (P12; reference st_common.py:358-375)."""
    out = stores
    if alias is not None:
        out = [s for s in out if s.alias == alias]
    if model is not None:
        out = [s for s in out if s.model == model]
    if chunk_size is not None:
        out = [s for s in out if s.chunk_size == chunk_size]
    if chunk_overlap is not None:
        out = [s for s in out if s.chunk_overlap == chunk_overlap]
    if distance_metric is not None:
        out = [s for s in out if s.distance_metric == distance_metric]
    if index_type is not None:
        out = [s for s in out if s.index_type == index_type]
    return out
