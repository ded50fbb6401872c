"""One scaling-probe measurement in a FRESH process — the honest model
of "the same job on an N-core cluster".

Why a subprocess per leg (round 5): the in-process protocol ran every
leg inside one persistent 32-core/48g py4j JVM, so a "local[2]" leg
still got the JVM's full complement of GC / shuffle-IO / codegen
threads on the other 30 cores. That subsidizes the 2-core leg (its
throughput includes ~free GC done by 30 idle cores), deflating the
measured 2→8 efficiency, and makes the 8-core leg's share of GC timing
a noise source — on an IDLE box the in-process local[8] leg swung
1.03M-1.79M eps between pairs while the local[2] leg held within 10%.

Run via ``taskset -c 0..N-1`` (bench.py does this) so the process —
JVM, Python driver, GC threads, everything — is confined to exactly N
cores, the way an N-core executor node would be. The JVM additionally
gets ``-XX:ActiveProcessorCount=N`` so every internal pool sizes to the
leg, not to the host.

Prints one JSON line: {"cores": N, "eps": float, "wall": float,
"edges": int}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--iterations", type=int, default=2)
    ap.add_argument("--n", type=int, default=4_000_000)
    ap.add_argument("--parts", type=int, default=64)
    ap.add_argument("--heap", default=None,
                    help="JVM heap for this leg (default: 3g + 1.5g/core)")
    args = ap.parse_args()

    heap = args.heap or f"{3 + int(1.5 * args.cores)}g"
    os.environ["SPARK_DRIVER_MEMORY"] = heap
    # every thread pool inside the JVM sizes to the leg's core count
    os.environ.setdefault(
        "SPARK_SUBMIT_OPTS",
        f"-XX:ActiveProcessorCount={args.cores}",
    )

    from bench import SCALE_ITERS, load_probe_graph, probe_edge_count  # noqa: E402
    from lynxkite_spark.operators import pagerank  # noqa: E402
    from lynxkite_spark.session import get_spark  # noqa: E402

    iters = args.iterations or SCALE_ITERS
    spark = get_spark(
        cores=args.cores,
        shuffle_partitions=args.parts,
        app_name=f"scale_leg_{args.cores}",
        extra_conf={
            # identical static plan at both levels (BENCH/BASELINE.md)
            "spark.sql.adaptive.enabled": "false",
            "spark.driver.extraJavaOptions":
                f"-XX:ActiveProcessorCount={args.cores}",
        },
    )
    g = load_probe_graph(spark, args.n)
    e = probe_edge_count(args.n)
    # explicit warm-up: one 1-iteration run exercises every codegen and
    # shuffle path of the timed job (JIT + page cache)
    pagerank(g, damping=0.85, iterations=1, tol=None).count()
    t0 = time.time()
    pagerank(g, damping=0.85, iterations=iters, tol=None).count()
    wall = time.time() - t0
    spark.stop()
    print(json.dumps({
        "cores": args.cores,
        "eps": e * iters / wall,
        "wall": wall,
        "edges": e,
        "heap": heap,
    }), flush=True)


if __name__ == "__main__":
    main()
