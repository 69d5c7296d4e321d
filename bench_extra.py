#!/usr/bin/env python
"""Round-8 optimization probes (bench.py is FROZEN for measurement —
this file carries the isolation experiments the guide's §1 asks for).

Modes (PGTS_PROBE env):
  gen        — time generate_pages->parquet for a given size
  build      — time one build (optionally pinned to N cpus) with the
               builder's per-phase metrics dict
  child      — exact replica of bench.py's scaling child wall
               (session + warm + timed), reporting each piece
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _pin(n: int) -> None:
    if n and hasattr(os, "sched_setaffinity"):
        os.sched_setaffinity(0, set(range(n)))


def _abs_probe() -> dict:
    """bench.py's absolute hardware probe (memcpy GB/s + sha256) so
    every recorded experiment carries its epoch bracket."""
    import hashlib
    import math as _m

    import numpy as np

    a = np.empty(32_000_000, dtype=np.int64)
    a[:] = 1
    b = np.empty_like(a)
    np.copyto(b, a)
    memcpy_gbps = 0.0
    for _ in range(3):
        t0 = time.time()
        for _ in range(2):
            np.copyto(b, a)
        memcpy_gbps = max(
            memcpy_gbps, 2 * 2 * a.nbytes / (time.time() - t0) / 1e9
        )
    data = a.tobytes()[:128_000_000]
    sha_sec = _m.inf
    for _ in range(3):
        t0 = time.time()
        hashlib.sha256(data).hexdigest()
        sha_sec = min(sha_sec, time.time() - t0)
    return {"memcpy_gbps": round(memcpy_gbps, 2),
            "sha_sec": round(sha_sec, 3)}


def _session(cores: int, tag: str):
    from pg_textsearch_spark.session import get_spark
    from pg_textsearch_spark.shipping import ensure_shipped

    spark = get_spark(
        app_name=f"probe-{tag}",
        master=f"local[{cores}]",
        shuffle_partitions=2 * cores,
    )
    spark.sparkContext.setLogLevel("ERROR")
    ensure_shipped(spark)
    return spark


def main() -> None:
    mode = os.environ.get("PGTS_PROBE", "build")
    cores = int(os.environ.get("PGTS_PROBE_CORES", "32"))
    pin = os.environ.get("PGTS_PROBE_PIN", "0") == "1"
    n_docs = int(os.environ.get("PGTS_PROBE_DOCS", "2000000"))
    config = os.environ.get("PGTS_PROBE_CONFIG", "english")
    if pin:
        _pin(cores)
    out: dict = {"mode": mode, "cores": cores, "pin": pin, "docs": n_docs}

    t0 = time.time()
    spark = _session(cores, f"{mode}-{cores}")
    out["session_sec"] = round(time.time() - t0, 2)

    from pg_textsearch_spark.sources.pages import generate_pages

    path = f"/tmp/pgts_pages_{n_docs}_42.parquet"
    if mode == "gen":
        shutil.rmtree(path, ignore_errors=True)
        t0 = time.time()
        generate_pages(spark, n_docs, seed=42).write.mode(
            "overwrite"
        ).parquet(path)
        out["gen_sec"] = round(time.time() - t0, 2)
    else:
        if not os.path.exists(path + "/_SUCCESS"):
            generate_pages(spark, n_docs, seed=42).write.mode(
                "overwrite"
            ).parquet(path)
        from pg_textsearch_spark.index.builder import build_index

        def one_build(p: str, tag: str) -> tuple[float, dict]:
            odir = f"/tmp/pgts_probe_{tag}"
            shutil.rmtree(odir, ignore_errors=True)
            pages = spark.read.parquet(p)
            m: dict = {}
            t0 = time.time()
            build_index(
                spark, pages, odir, key_col="url", text_col="text",
                config=config, n_buckets=32, metrics=m,
            )
            wall = time.time() - t0
            shutil.rmtree(odir, ignore_errors=True)
            return wall, m

        if mode == "child":
            wpath = f"/tmp/pgts_pages_{min(max(n_docs // 4, 2000), 1_000_000)}_7.parquet"
            if not os.path.exists(wpath + "/_SUCCESS"):
                generate_pages(
                    spark, min(max(n_docs // 4, 2000), 1_000_000), seed=7
                ).write.mode("overwrite").parquet(wpath)
            t0 = time.time()
            w_wall, w_m = one_build(wpath, f"warm{cores}")
            out["warm_sec"] = round(w_wall, 2)
            out["warm_metrics"] = w_m
        runs = int(os.environ.get("PGTS_PROBE_RUNS", "1"))
        walls = []
        probes = [_abs_probe()]
        for i in range(runs):
            wall, m = one_build(path, f"timed{cores}")
            walls.append(round(wall, 2))
            out[f"metrics_{i}"] = m
            probes.append(_abs_probe())
        out["build_sec"] = walls
        out["abs_probes"] = probes
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
