"""Per-query noise-free profiler (guide §1: measure first).

Wall-clock on this box swings 5-10x between identical runs (hypervisor
steal, documented since r5), so every optimization claim this round is
backed by metrics that don't drift with the VM scheduler:

- job count (statusTracker census per query),
- task CPU time / shuffle bytes read+written (event-log
  ``SparkListenerTaskEnd`` sums, keyed by job group = query name),
- best-of-N wall as corroboration only.

Usage:
    python tools/perf_probe.py t09 c08 pipe02        # id prefixes
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/perf_probe.py c02

Prints one JSON line per query:
    {"q": "c08", "wall_best": 2.1, "jobs": 9, "cpu_s": 14.2,
     "shuf_write_mb": 5.5, "shuf_read_mb": 5.5, "tasks": 310}
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from serverless_etl_reporting_pipeline_spark.plans import REGISTRY  # noqa: E402
from serverless_etl_reporting_pipeline_spark.session import get_spark  # noqa: E402


def _open_event_log(path: str):
    if path.endswith(".gz"):
        return gzip.open(path, "rt")
    if path.endswith(".zstd"):
        import zstandard

        fh = zstandard.ZstdDecompressor().stream_reader(open(path, "rb"))
        import io

        return io.TextIOWrapper(fh)
    return open(path)


def parse_event_log(log_dir: str) -> dict[str, dict]:
    """Sum task metrics per job group from every event log under
    ``log_dir``. Returns {group: {cpu_s, shuf_write_mb, ...}}."""
    sums: dict[str, dict] = {}
    job_group: dict[int, str] = {}  # job id -> group
    stage_group: dict[int, str] = {}  # stage id -> group
    paths = [
        p
        for p in sorted(
            glob.glob(os.path.join(log_dir, "*"))
            + glob.glob(os.path.join(log_dir, "*", "events_*"))
        )
        if not os.path.isdir(p) and "appstatus" not in os.path.basename(p)
    ]
    for path in paths:
        with _open_event_log(path) as fh:
            for line in fh:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                kind = ev.get("Event")
                if kind == "SparkListenerJobStart":
                    grp = (ev.get("Properties") or {}).get("spark.jobGroup.id")
                    if grp:
                        job_group[ev["Job ID"]] = grp
                        for st in ev.get("Stage Infos", []):
                            stage_group[st["Stage ID"]] = grp
                elif kind == "SparkListenerTaskEnd":
                    grp = stage_group.get(ev.get("Stage ID"))
                    if not grp:
                        continue
                    tm = ev.get("Task Metrics") or {}
                    d = sums.setdefault(
                        grp,
                        {
                            "tasks": 0,
                            "cpu_ns": 0,
                            "run_ms": 0,
                            "shuf_write_b": 0,
                            "shuf_read_b": 0,
                            "input_b": 0,
                        },
                    )
                    d["tasks"] += 1
                    d["cpu_ns"] += tm.get("Executor CPU Time", 0)
                    d["run_ms"] += tm.get("Executor Run Time", 0)
                    d["shuf_write_b"] += (tm.get("Shuffle Write Metrics") or {}).get(
                        "Shuffle Bytes Written", 0
                    )
                    rm = tm.get("Shuffle Read Metrics") or {}
                    d["shuf_read_b"] += rm.get("Remote Bytes Read", 0) + rm.get(
                        "Local Bytes Read", 0
                    )
                    d["input_b"] += (tm.get("Input Metrics") or {}).get("Bytes Read", 0)
    out = {}
    jobs_per_group: dict[str, int] = {}
    for jid, grp in job_group.items():
        jobs_per_group[grp] = jobs_per_group.get(grp, 0) + 1
    for grp, d in sums.items():
        out[grp] = {
            "jobs": jobs_per_group.get(grp, 0),
            "tasks": d["tasks"],
            "cpu_s": round(d["cpu_ns"] / 1e9, 2),
            "run_s": round(d["run_ms"] / 1e3, 2),
            "shuf_write_mb": round(d["shuf_write_b"] / 1e6, 3),
            "shuf_read_mb": round(d["shuf_read_b"] / 1e6, 3),
            "input_mb": round(d["input_b"] / 1e6, 3),
        }
    return out


def main() -> None:
    ids = [a for a in sys.argv[1:] if not a.startswith("-")]
    runs = int(os.environ.get("SPARK_GRAFT_PROBE_RUNS", "3"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    log_dir = tempfile.mkdtemp(prefix="spark_graft_evlog_")
    spark = get_spark(
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": log_dir,
            "spark.eventLog.compress": "false",
        }
    )
    by_prefix = {n.split("_", 1)[0]: n for n in REGISTRY}
    names = [by_prefix[i] if i in by_prefix else i for i in ids]
    walls: dict[str, float] = {}
    for name in names:
        q = REGISTRY[name]
        qid = name.split("_", 1)[0]
        # warm once (JIT/page-cache), unmeasured
        q.builder(spark, sf_dir).collect()
        spark.catalog.clearCache()
        best = float("inf")
        for _ in range(runs):
            spark.sparkContext.setJobGroup(qid, name)
            t0 = time.time()
            q.builder(spark, sf_dir).collect()
            best = min(best, time.time() - t0)
            spark.catalog.clearCache()
        walls[qid] = round(best, 3)
    spark.stop()
    metrics = parse_event_log(log_dir)
    import shutil

    shutil.rmtree(log_dir, ignore_errors=True)  # ~10-100 MB per invocation
    for name in names:
        qid = name.split("_", 1)[0]
        m = metrics.get(qid, {})
        # metrics cover ALL runs of the query (warm run excluded: it ran
        # before setJobGroup); divide per-run where it matters
        m = {k: (round(v / runs, 3) if isinstance(v, (int, float)) else v) for k, v in m.items()}
        print(json.dumps({"q": qid, "wall_best": walls[qid], "runs": runs, **m}))


if __name__ == "__main__":
    main()
