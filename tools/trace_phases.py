"""Per-phase wall-clock + Spark-job breakdown for the expensive bench
operators (guide §1: measure first; §1.5 label your jobs).

Runs ONE operator (argv[1]) at $SPARK_GRAFT_SF_DIR with the Spark event
log enabled, labelling each driver-side phase via setJobDescription,
then parses the event log into per-description job wall time so the fix
targets the real cost, not the guessed one.

Usage: python tools/trace_phases.py hdrf_chunked|ne_coarse|cc|...
Writes nothing to the repo; prints a sorted breakdown.
"""

from __future__ import annotations

import json
import os
import sys
import time
from collections import defaultdict
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
EVDIR = "/tmp/spark-events"


def main() -> None:
    op = sys.argv[1] if len(sys.argv) > 1 else "hdrf_chunked"
    import shutil

    shutil.rmtree(EVDIR, ignore_errors=True)
    os.makedirs(EVDIR, exist_ok=True)

    from linkgraph.session import get_spark

    extra = {
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": EVDIR,
        "spark.eventLog.compress": "false",
        "spark.ui.showConsoleProgress": "false",
    }
    # optional conf overrides for A/B runs: TRACE_CONF="k=v,k=v"
    for kv in os.environ.get("TRACE_CONF", "").split(","):
        if "=" in kv:
            k, v = kv.split("=", 1)
            extra[k] = v
    spark = get_spark("trace-" + op, extra_conf=extra)
    sc = spark.sparkContext

    from linkgraph.graph import edges_from_lineitem

    edges = edges_from_lineitem(spark, SF_DIR).repartition(32).cache()
    sc.setJobDescription("setup:edges")
    m = edges.count()
    print(f"edges={m}", flush=True)

    t0 = time.time()
    if op == "hdrf_chunked":
        from linkgraph.partition.hdrf import hdrf_spark
        from linkgraph.partition.metrics import edge_partition_metrics

        sc.setJobDescription("op")
        out = hdrf_spark(edges, 32, exact=False)
        sc.setJobDescription("metrics")
        print(edge_partition_metrics(out, 32).first())
    elif op == "ne_coarse":
        from linkgraph.partition.ne import ne_coarse
        from linkgraph.partition.metrics import edge_partition_metrics

        sc.setJobDescription("op")
        out = ne_coarse(edges, 32)
        sc.setJobDescription("metrics")
        print(edge_partition_metrics(out, 32).first())
    elif op == "cc":
        from linkgraph.algos.cc import connected_components

        sc.setJobDescription("op")
        print(connected_components(edges, max_iterations=12).count())
    elif op == "scc":
        from linkgraph.graph import directed_edges_from_lineitem
        from linkgraph.algos.scc import strongly_connected_components

        dedges = directed_edges_from_lineitem(spark, SF_DIR).cache()
        dedges.count()
        sc.setJobDescription("op")
        print(strongly_connected_components(dedges).count())
    elif op == "triangles":
        from linkgraph.algos.triangles import triangle_total

        sc.setJobDescription("op")
        print(triangle_total(edges).first())
    elif op == "kcore":
        from linkgraph.algos.kcore import k_core

        sc.setJobDescription("op")
        print(k_core(edges, k=65, fixed_iterations=8).count())
    elif op == "node2vec":
        from linkgraph.algos.walks import node2vec_walks

        sc.setJobDescription("op")
        print(node2vec_walks(edges, walk_len=3).count())
    elif op == "topo":
        from linkgraph.algos.dag import topo_levels

        sc.setJobDescription("op")
        print(topo_levels(edges, max_depth=6).count())
    elif op == "pr_superstep":
        sys.path.insert(0, str(REPO))
        import bench

        sc.setJobDescription("op")
        times, m2 = bench._pagerank_superstep_times(spark, edges)
        print("superstep times", [round(t, 3) for t in times], "m2", m2)
    else:
        raise SystemExit(f"unknown op {op}")
    wall = time.time() - t0
    print(f"op_wall={wall:.2f}s", flush=True)

    app_id = sc.applicationId
    spark.stop()

    # ---- parse event log: job wall time per description --------------
    ev = Path(EVDIR) / app_id
    if not ev.exists():  # Spark 4 rolling event log v2 layout
        cand = sorted(Path(EVDIR).glob(f"eventlog_v2_{app_id}/events_*"))
        lines = []
        for c in cand:
            lines.extend(c.open().readlines())
    else:
        lines = ev.open().readlines()
    jobs: dict[int, dict] = {}
    stage_info: dict[int, dict] = {}
    for line in lines:
        try:
            e = json.loads(line)
        except json.JSONDecodeError:
            continue
        t = e.get("Event")
        if t == "SparkListenerJobStart":
            jobs[e["Job ID"]] = {
                "desc": e.get("Properties", {}).get(
                    "spark.job.description", "?"
                ),
                "start": e["Submission Time"],
                "stages": [s["Stage ID"] for s in e["Stage Infos"]],
            }
        elif t == "SparkListenerJobEnd":
            if e["Job ID"] in jobs:
                jobs[e["Job ID"]]["end"] = e["Completion Time"]
        elif t == "SparkListenerStageCompleted":
            si = e["Stage Info"]
            stage_info[si["Stage ID"]] = {
                "name": si["Stage Name"].split("\n")[0],
                "ms": si.get("Completion Time", 0)
                - si.get("Submission Time", si.get("Completion Time", 0)),
                "tasks": si["Number of Tasks"],
            }

    by_desc: dict[str, list] = defaultdict(list)
    for jid, j in sorted(jobs.items()):
        if "end" not in j:
            continue
        by_desc[j["desc"]].append((jid, (j["end"] - j["start"]) / 1000.0, j))
    print("\n=== job wall by description ===")
    for d, js in by_desc.items():
        tot = sum(x[1] for x in js)
        print(f"{d[:60]:60s} n_jobs={len(js):3d} total={tot:7.2f}s")
    print("\n=== individual jobs (>0.2s) ===")
    for jid, j in sorted(jobs.items()):
        if "end" not in j:
            continue
        dt = (j["end"] - j["start"]) / 1000.0
        if dt < 0.2:
            continue
        stg = [
            f"{sid}:{stage_info[sid]['name'][:38]}({stage_info[sid]['ms']}ms/{stage_info[sid]['tasks']}t)"
            for sid in j["stages"]
            if sid in stage_info
        ]
        print(f"job {jid:4d} {dt:6.2f}s {j['desc'][:28]:28s} {' | '.join(stg)}")
    print("\n=== slowest stages ===")
    for sid, s in sorted(stage_info.items(), key=lambda x: -x[1]["ms"])[:25]:
        print(f"stage {sid:4d} {s['ms']/1000.0:7.2f}s {s['tasks']:4d}t {s['name'][:70]}")


if __name__ == "__main__":
    main()
