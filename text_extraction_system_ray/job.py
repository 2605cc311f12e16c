"""Job entry point — the ``ray job submit`` surface.

Reference analog: the upload endpoint + per-request flags
(``web_api.py:67-140``); here a batch job over Parquet with job-level
config (SURVEY.md §2.1 S2: per-row flags become job-level config).

    ray job submit -- python -m text_extraction_system_ray.job \
        --input 'pages/*.parquet' --output out/ \
        [--doc-language en] [--no-tables] [--exploded] \
        [--files-per-partition 4]

Runs checkpointed (resumable — rerun the same command after a crash and
committed partitions are skipped; ``ray job stop`` + rerun is the
cancel/resume story, ref S8 analog). Standalone execution auto-inits Ray
in local mode; under ``ray job submit`` it attaches to the cluster.
"""
from __future__ import annotations

import argparse
import glob
import json
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="text_extraction_system_ray.job")
    ap.add_argument("--input", required=True,
                    help="input parquet file, glob, or directory")
    ap.add_argument("--output", required=True, help="output directory")
    ap.add_argument("--doc-language", default="",
                    help="force document language (ref: doc_language flag)")
    ap.add_argument("--no-tables", action="store_true",
                    help="disable table extraction (ref: table_extraction_enable)")
    ap.add_argument("--exploded", action="store_true",
                    help="use the page-explode + groupby(url) skew path")
    ap.add_argument("--files-per-partition", type=int, default=4)
    ap.add_argument("--dedup-urls", action="store_true",
                    help="exact url-dedup (first wins) before extraction")
    args = ap.parse_args(argv)

    import ray
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")

    import os
    from .config import PipelineConfig
    from .pipelines.extraction import (dedup_pages, extract_dataset,
                                       extract_dataset_exploded)
    from .state.checkpoint import job_metrics, run_checkpointed

    if os.path.isdir(args.input):
        files = sorted(glob.glob(os.path.join(args.input, "*.parquet")))
    else:
        files = sorted(glob.glob(args.input))
    if not files:
        print(f"error: no parquet files match {args.input}", file=sys.stderr)
        return 2

    cfg = PipelineConfig(table_extraction_enable=not args.no_tables,
                         doc_language=args.doc_language)
    base = (extract_dataset_exploded if args.exploded else extract_dataset)

    def pipeline(ds, c):
        if args.dedup_urls:
            ds = dedup_pages(ds)
        return base(ds, c)

    done = run_checkpointed(files, args.output, cfg, pipeline=pipeline,
                            files_per_partition=args.files_per_partition)
    metrics = job_metrics(args.output)
    print(json.dumps({"processed_partitions": done, **metrics}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
