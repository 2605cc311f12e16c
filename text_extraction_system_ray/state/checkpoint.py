"""Resumable partition-checkpointed execution (SURVEY.md §4.4).

Reference analog: the WebDAV ``metadata.json`` durable ledger +
``tasks_pending/`` mirror + beat re-publisher (``request_metadata.py:113-125``,
``task_health/task_health.py:39-134``) — at-least-once with idempotence via
status checks. The Ray engine replaces that with a *partition commit log*:

    out/part-{pid}/...parquet        (atomic: written to _tmp, renamed)
    out/_manifest/{pid}.json         (commit record + lineage + metrics)

A partition is committed iff its manifest exists; the manifest is written
only after the output rename. On resume the driver lists manifests and
feeds only uncommitted input splits to the pipeline — the analog of
``re_schedule_unknown_pending_tasks`` without the double-delivery race the
reference comments on at ``tasks.py:551-555``.

The partition unit is a group of input files: deterministic, independent of
row contents, stable across runs — at production scale the input is many
Parquet shards, so file groups give natural resume granularity. Each
manifest doubles as the per-partition metrics record (rows/s, bytes) that
replaces the reference's HTTP progress callbacks (``tasks.py:345-354``).
"""
from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import dataclass
from typing import Callable, List, Optional, Sequence

import ray.data

from .. import __version__
from ..config import DEFAULT_CONFIG, PipelineConfig
from ..pipelines.extraction import extract_dataset


@dataclass
class Partition:
    pid: str
    files: List[str]


def plan_partitions(input_files: Sequence[str],
                    files_per_partition: int = 1) -> List[Partition]:
    """Deterministic partition plan: sorted files, fixed-size groups,
    pid = zero-padded index (stable across runs for the same input set)."""
    files = sorted(input_files)
    parts = []
    for i in range(0, len(files), files_per_partition):
        pid = f"{i // files_per_partition:05d}"
        parts.append(Partition(pid=pid, files=files[i:i + files_per_partition]))
    return parts


def committed_partitions(out_dir: str) -> set:
    mdir = os.path.join(out_dir, "_manifest")
    if not os.path.isdir(mdir):
        return set()
    return {f[:-5] for f in os.listdir(mdir)
            if f.endswith(".json") and not f.startswith("_")}


def _cleanup_uncommitted(out_dir: str, committed: set) -> None:
    """Remove partial output dirs with no manifest (crash leftovers)."""
    tmp = os.path.join(out_dir, "_tmp")
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)
    if os.path.isdir(out_dir):
        for name in os.listdir(out_dir):
            if name.startswith("part-") and name[5:] not in committed:
                shutil.rmtree(os.path.join(out_dir, name))


def run_checkpointed(
    input_files: Sequence[str],
    out_dir: str,
    cfg: Optional[PipelineConfig] = None,
    pipeline: Callable[[ray.data.Dataset, PipelineConfig], ray.data.Dataset] = None,
    files_per_partition: int = 1,
    stop_after: Optional[int] = None,
    max_concurrent: int = 1,
) -> List[str]:
    """Run ``pipeline`` over each uncommitted partition; commit atomically.

    Returns the pids processed in this invocation. ``stop_after`` is a test
    hook simulating a mid-job crash after N partitions.

    ``max_concurrent`` > 1 overlaps that many partition pipelines (each
    driven from its own driver thread — Ray Data executes concurrent
    Datasets independently). Commits stay per-partition and atomic, so
    kill/resume semantics are unchanged; overlap recovers the
    cross-partition pipelining a serial loop loses when partitions are
    small (many tiny shards at 100-TB scale).
    """
    cfg = cfg or DEFAULT_CONFIG
    pipeline = pipeline or (lambda ds, c: extract_dataset(ds, c))
    os.makedirs(os.path.join(out_dir, "_manifest"), exist_ok=True)
    _check_plan(out_dir, input_files, files_per_partition)
    committed = committed_partitions(out_dir)
    _cleanup_uncommitted(out_dir, committed)

    def _run_one(part: Partition) -> str:
        t0 = time.monotonic()
        bytes_in = sum(os.path.getsize(f) for f in part.files)
        ds = ray.data.read_parquet(part.files)
        out_ds = pipeline(ds, cfg)
        tmp_dir = os.path.join(out_dir, "_tmp", f"part-{part.pid}")
        os.makedirs(tmp_dir, exist_ok=True)
        out_ds.write_parquet(tmp_dir)
        n_rows = _count_rows(tmp_dir)
        final_dir = os.path.join(out_dir, f"part-{part.pid}")
        os.rename(tmp_dir, final_dir)
        wall = time.monotonic() - t0
        bytes_out = sum(os.path.getsize(os.path.join(final_dir, f))
                        for f in os.listdir(final_dir))
        manifest = {
            "partition_id": part.pid,
            "input_files": part.files,
            "row_count": n_rows,
            "bytes_in": bytes_in,
            "bytes_out": bytes_out,
            "wall_s": round(wall, 4),
            "rows_per_s": round(n_rows / wall, 2) if wall > 0 else None,
            "engine_version": __version__,
        }
        mpath = os.path.join(out_dir, "_manifest", f"{part.pid}.json")
        with open(mpath + ".tmp", "w") as f:
            json.dump(manifest, f)
        os.rename(mpath + ".tmp", mpath)
        return part.pid

    todo = [p for p in plan_partitions(input_files, files_per_partition)
            if p.pid not in committed]
    if stop_after is not None:
        todo = todo[:stop_after]
    if max_concurrent > 1 and ray.is_initialized():
        # every concurrent pipeline needs its minimum actor placed AND at
        # least one free CPU cluster-wide for read/write tasks to make
        # progress — N pipelines on N CPUs deadlocks (min-actors hold
        # every CPU, read tasks starve). Clamp to CPUs - 1.
        cpus = int(ray.cluster_resources().get("CPU", 2))
        max_concurrent = max(1, min(max_concurrent, cpus - 1))
    if max_concurrent <= 1 or len(todo) <= 1:
        return [_run_one(p) for p in todo]
    _ensure_fsspec_http_importable()
    from concurrent.futures import ThreadPoolExecutor
    with ThreadPoolExecutor(max_workers=max_concurrent) as ex:
        return list(ex.map(_run_one, todo))


def _ensure_fsspec_http_importable() -> None:
    """Ray Data path resolution does ``from fsspec.implementations.http
    import HTTPFileSystem`` on every read/write. In environments without
    aiohttp that import fails — harmlessly when serial (Ray catches it),
    but under concurrent driver threads the failed-module cleanup races
    on sys.modules and surfaces as a spurious ImportError mid-job.
    Register a benign stub once so the import is deterministic; the stub
    is only ever an isinstance target, never instantiated for local
    parquet paths."""
    try:
        from fsspec.implementations.http import HTTPFileSystem  # noqa: F401
        return
    except ImportError:
        pass
    import sys
    import types

    mod = types.ModuleType("fsspec.implementations.http")

    class HTTPFileSystem:  # pragma: no cover — isinstance target only
        pass

    mod.HTTPFileSystem = HTTPFileSystem
    sys.modules["fsspec.implementations.http"] = mod


def _check_plan(out_dir: str, input_files: Sequence[str],
                files_per_partition: int) -> None:
    """Bind the output directory to ONE input plan. Partition ids are
    positional, so resuming against a different input set or grouping
    would silently skip the wrong work — refuse instead (the analog of
    the reference's request-id scoping: one request dir per input,
    ``request_metadata.py:113-125``)."""
    plan = {"input_files": sorted(str(f) for f in input_files),
            "files_per_partition": files_per_partition}
    path = os.path.join(out_dir, "_manifest", "_plan.json")
    if os.path.exists(path):
        with open(path) as f:
            existing = json.load(f)
        if existing != plan:
            raise ValueError(
                f"output dir {out_dir} was created for a different input "
                "plan (files or files_per_partition changed); use a fresh "
                "output dir or delete the old one")
        return
    with open(path + ".tmp", "w") as f:
        json.dump(plan, f)
    os.rename(path + ".tmp", path)


def _count_rows(parquet_dir: str) -> int:
    import pyarrow.parquet as pq
    return sum(pq.ParquetFile(os.path.join(parquet_dir, f)).metadata.num_rows
               for f in os.listdir(parquet_dir) if f.endswith(".parquet"))


def read_output(out_dir: str) -> ray.data.Dataset:
    """Read all committed partitions as one Dataset.

    Zero committed partitions (e.g. status probe right after a crash
    before the first commit) yields an empty EXTRACTED_SCHEMA dataset
    rather than the ``read_parquet([])`` ValueError."""
    files = []
    for pid in sorted(committed_partitions(out_dir)):
        pdir = os.path.join(out_dir, f"part-{pid}")
        files.extend(os.path.join(pdir, f) for f in sorted(os.listdir(pdir))
                     if f.endswith(".parquet"))
    if not files:
        from ..schema import EXTRACTED_SCHEMA
        return ray.data.from_arrow(EXTRACTED_SCHEMA.empty_table())
    return ray.data.read_parquet(files)


def job_metrics(out_dir: str) -> dict:
    """Aggregate the per-partition manifests (progress/estimate analog)."""
    mdir = os.path.join(out_dir, "_manifest")
    total = {"partitions": 0, "rows": 0, "bytes_in": 0, "bytes_out": 0,
             "wall_s": 0.0}
    if not os.path.isdir(mdir):
        return total
    for f in sorted(os.listdir(mdir)):
        if not f.endswith(".json") or f.startswith("_"):
            continue
        with open(os.path.join(mdir, f)) as fh:
            m = json.load(fh)
        total["partitions"] += 1
        total["rows"] += m["row_count"]
        total["bytes_in"] += m["bytes_in"]
        total["bytes_out"] += m["bytes_out"]
        total["wall_s"] += m["wall_s"]
    return total


def query_status(out_dir: str, sort_column: str = "partition_id",
                 descending: bool = False, page_index: int = 0,
                 records_on_page: int = 20):
    """Sorted + paginated view over the partition manifests (reference
    analog: status list/query/sort/paginate endpoints,
    ``web_api.py:175-219`` with ``sort_column``/``records_on_page``/
    ``page_index``)."""
    import pandas as pd
    mdir = os.path.join(out_dir, "_manifest")
    rows = []
    if os.path.isdir(mdir):
        for f in sorted(os.listdir(mdir)):
            if f.endswith(".json") and not f.startswith("_"):
                with open(os.path.join(mdir, f)) as fh:
                    rows.append(json.load(fh))
    df = pd.DataFrame(rows)
    if df.empty:
        return df
    df = df.sort_values(sort_column, ascending=not descending,
                        kind="stable")
    start = page_index * records_on_page
    return df.iloc[start:start + records_on_page].reset_index(drop=True)
