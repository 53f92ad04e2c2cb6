"""Thin CLI (the analogue of the reference's ``recon stats`` CLI,
recon/cli/stats.py:13-76): ``python -m recon_ray <cmd>``.

Commands:
  run    <files_dir> <out_dir>   checkpointed KG pipeline (resumable)
  stats  <files_dir>             corpus stats report (ner stats, coverage,
                                 disparities — the `recon stats` analogue)
  score  <pred_parquet> <gold_parquet>   triple P/R/F
  search <files_dir> <query>     substring search over file contents
                                 (Dataset.search analogue)
  bench                          delegate to bench.py

On a real cluster each command is submitted via ``ray job submit -- python
-m recon_ray ...``; locally it initializes a local Ray session itself
(guarded — the driver-owned entrypoints never call this).
"""

from __future__ import annotations

import argparse
import json
import sys


def _ensure_ray():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    import logging

    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)


def cmd_run(args) -> int:
    _ensure_ray()
    from recon_ray.state.runner import run_kg_checkpointed

    res = run_kg_checkpointed(
        args.files_dir, args.out_dir, fragments_per_shard=args.fragments_per_shard
    )
    print(
        json.dumps(
            {
                "shards_run": res["shards_run"],
                "shards_skipped": res["shards_skipped"],
                "complete": res["complete"],
                "final_dir": res["final_dir"],
            }
        )
    )
    return 0


def cmd_stats(args) -> int:
    _ensure_ray()
    from recon_ray.functions import insights as ins
    from recon_ray.functions import stats as st
    from recon_ray.pipelines.kg import run_kg

    res = run_kg(args.files_dir, materialize_docs=True)
    s = st.ner_stats(res["docs"])
    print("== ner stats ==")
    print(json.dumps(s, indent=1))
    print("== entity coverage (top 15) ==")
    print(st.entity_coverage(res["mentions"]).to_pandas().head(15).to_string())
    print("== label disparities ==")
    print(ins.top_label_disparities(res["mentions"], dedupe=True).to_string())
    print("== label balance entropy ==")
    print(round(st.label_balance_entropy(s), 4))
    return 0


def cmd_score(args) -> int:
    import pandas as pd

    from recon_ray.functions.scoring import score_triples_frames

    pred = pd.read_parquet(args.pred)
    gold = pd.read_parquet(args.gold)
    s = score_triples_frames(pred, gold)
    print(json.dumps(s, indent=1))
    return 0 if s["f1"] >= args.min_f1 else 1


def cmd_search(args) -> int:
    _ensure_ray()
    import ray.data as rd

    from recon_ray.functions.text import search

    hits = search(
        rd.read_parquet(args.files_dir),
        args.query,
        case_sensitive=not args.ignore_case,
        text_col=args.text_col,
    )
    # print match keys (repo/path/doc_id when present), streaming
    n = 0
    for b in hits.iter_batches(batch_format="pandas"):
        cols = [c for c in ("repo", "path", "doc_id") if c in b.columns]
        for _, row in b[cols].iterrows() if cols else ():
            print("\t".join(str(v) for v in row.values))
        n += len(b)
    print(f"# {n} matching rows", file=sys.stderr)
    return 0


def cmd_bench(args) -> int:
    import subprocess

    import os

    cmd = [sys.executable, os.path.join(os.path.dirname(__file__), "..", "bench.py")]
    if args.scaling:
        cmd.append("--scaling")
    return subprocess.call(cmd)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="recon_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    pr = sub.add_parser("run", help="checkpointed KG pipeline")
    pr.add_argument("files_dir")
    pr.add_argument("out_dir")
    pr.add_argument("--fragments-per-shard", type=int, default=8)
    pr.set_defaults(fn=cmd_run)

    ps = sub.add_parser("stats", help="corpus stats report")
    ps.add_argument("files_dir")
    ps.set_defaults(fn=cmd_stats)

    pc = sub.add_parser("score", help="triple P/R/F")
    pc.add_argument("pred")
    pc.add_argument("gold")
    pc.add_argument("--min-f1", type=float, default=0.95)
    pc.set_defaults(fn=cmd_score)

    pse = sub.add_parser("search", help="substring search over contents")
    pse.add_argument("files_dir")
    pse.add_argument("query")
    pse.add_argument("-i", "--ignore-case", action="store_true")
    pse.add_argument("--text-col", default="content")
    pse.set_defaults(fn=cmd_search)

    pb = sub.add_parser("bench", help="benchmark")
    pb.add_argument("--scaling", action="store_true")
    pb.set_defaults(fn=cmd_bench)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
