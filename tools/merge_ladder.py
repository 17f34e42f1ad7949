"""Multi-tick incremental-MERGE ladder (round-11 verdict ask #4).

The r10 round graded ``incremental_dedup_merge_stateful`` for ONE tick and
the streaming twin replayed two micro-batches; this tool runs the actual
production curve: N sequential ingest ticks against a GROWING, PERSISTED
``corpus_signature_state`` (parquet, re-read from disk each tick — nothing
is carried in memory between ticks), measuring per-tick wall time and
state-table row growth, then proves the N-tick accepted set is
bit-identical to the one-shot run over the same arrivals (the
prefix-decomposable seen-set rule, now asserted at data scale, not just on
the pytest fixture).

Document side: documents.parquet ordered by doc_id; first half = initial
corpus, the rest arrives in N id-ordered ticks.  Vector side (--vector):
the same protocol over embeddings.parquet with the banded-SimHash
signature state.

Usage: python tools/merge_ladder.py [sf_dir] [n_ticks] [--vector]
Prints a per-tick table + the one-shot parity verdict; exit 1 on mismatch.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

REPO = "/root/repo"
sys.path.insert(0, REPO)


def run_docs(spark, sf_dir: str, n_ticks: int) -> bool:
    from pyspark.sql import functions as F

    from mistocksync_spark.operators.dedup import (
        corpus_signature_state,
        incremental_dedup_merge,
    )

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .orderBy("doc_id")
    )
    ids = [r.doc_id for r in docs.select("doc_id").collect()]
    split = len(ids) // 2
    corpus_max = ids[split - 1]
    tick_bounds = [
        ids[split + (len(ids) - split) * (k + 1) // n_ticks - 1]
        for k in range(n_ticks)
    ]
    corpus = docs.filter(F.col("doc_id") <= corpus_max)

    state_dir = tempfile.mkdtemp(prefix="merge_ladder_docs_")
    try:
        t0 = time.monotonic()
        corpus.write.mode("overwrite").parquet(f"{state_dir}/v0/docs")
        corpus_signature_state(corpus).write.mode("overwrite").parquet(
            f"{state_dir}/v0/bands"
        )
        print(f"state v0 (corpus <= {corpus_max}): seeded in "
              f"{time.monotonic()-t0:.1f}s", flush=True)

        accepted_by_tick: list[set] = []
        print(f"{'tick':>4} {'arrivals':>9} {'accepted':>9} {'state_docs':>10} "
              f"{'state_bands':>11} {'wall_s':>7}")
        lo = corpus_max
        for k in range(n_ticks):
            hi = tick_bounds[k]
            batch = docs.filter((F.col("doc_id") > lo) & (F.col("doc_id") <= hi))
            t0 = time.monotonic()
            sdocs = spark.read.parquet(f"{state_dir}/v{k}/docs")
            sbands = spark.read.parquet(f"{state_dir}/v{k}/bands")
            merged = incremental_dedup_merge(sdocs, batch, corpus_bands=sbands)
            acc = {
                r.doc_id
                for r in merged.filter(F.col("origin") == "batch").collect()
            }
            # append state: ALL arrivals join the seen set (accepted or not)
            sdocs.unionByName(batch).write.mode("overwrite").parquet(
                f"{state_dir}/v{k + 1}/docs"
            )
            sbands.unionByName(corpus_signature_state(batch)).write.mode(
                "overwrite"
            ).parquet(f"{state_dir}/v{k + 1}/bands")
            wall = time.monotonic() - t0
            nd = spark.read.parquet(f"{state_dir}/v{k + 1}/docs").count()
            nb = spark.read.parquet(f"{state_dir}/v{k + 1}/bands").count()
            n_arr = batch.count()
            print(f"{k + 1:>4} {n_arr:>9} {len(acc):>9} {nd:>10} {nb:>11} "
                  f"{wall:>7.2f}", flush=True)
            accepted_by_tick.append(acc)
            lo = hi

        t0 = time.monotonic()
        oneshot = {
            r.doc_id
            for r in incremental_dedup_merge(
                corpus, docs.filter(F.col("doc_id") > corpus_max)
            )
            .filter(F.col("origin") == "batch")
            .collect()
        }
        ticked = set().union(*accepted_by_tick)
        ok = oneshot == ticked
        print(f"one-shot ({time.monotonic()-t0:.1f}s): accepted={len(oneshot)}; "
              f"{n_ticks}-tick union={len(ticked)}; "
              f"{'IDENTICAL' if ok else 'MISMATCH ' + str((ticked ^ oneshot))}")
        return ok
    finally:
        shutil.rmtree(state_dir, ignore_errors=True)


def run_vectors(spark, sf_dir: str, n_ticks: int) -> bool:
    from pyspark.sql import functions as F

    from mistocksync_spark.operators.vectors import (
        incremental_embedding_dedup,
        inferred_dim,
        signature_bands,
    )

    emb = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding")
        .orderBy("vec_id")
    )
    dim = inferred_dim(emb, "embedding")
    ids = [r.vec_id for r in emb.select("vec_id").collect()]
    split = len(ids) // 2
    corpus_max = ids[split - 1]
    tick_bounds = [
        ids[split + (len(ids) - split) * (k + 1) // n_ticks - 1]
        for k in range(n_ticks)
    ]
    corpus = emb.filter(F.col("vec_id") <= corpus_max)

    state_dir = tempfile.mkdtemp(prefix="merge_ladder_vec_")
    try:
        t0 = time.monotonic()
        corpus.write.mode("overwrite").parquet(f"{state_dir}/v0/vecs")
        signature_bands(corpus, dim).write.mode("overwrite").parquet(
            f"{state_dir}/v0/bands"
        )
        print(f"state v0 (corpus <= {corpus_max}): seeded in "
              f"{time.monotonic()-t0:.1f}s", flush=True)

        accepted_by_tick: list[set] = []
        print(f"{'tick':>4} {'arrivals':>9} {'accepted':>9} {'state_vecs':>10} "
              f"{'state_bands':>11} {'wall_s':>7}")
        lo = corpus_max
        for k in range(n_ticks):
            hi = tick_bounds[k]
            batch = emb.filter((F.col("vec_id") > lo) & (F.col("vec_id") <= hi))
            t0 = time.monotonic()
            svecs = spark.read.parquet(f"{state_dir}/v{k}/vecs")
            sbands = spark.read.parquet(f"{state_dir}/v{k}/bands")
            merged = incremental_embedding_dedup(
                svecs, batch, dim=dim, corpus_bands=sbands
            )
            acc = {
                r.vec_id
                for r in merged.filter(F.col("origin") == "batch").collect()
            }
            svecs.unionByName(batch).write.mode("overwrite").parquet(
                f"{state_dir}/v{k + 1}/vecs"
            )
            sbands.unionByName(
                signature_bands(batch, dim)
            ).write.mode("overwrite").parquet(f"{state_dir}/v{k + 1}/bands")
            wall = time.monotonic() - t0
            nv = spark.read.parquet(f"{state_dir}/v{k + 1}/vecs").count()
            nb = spark.read.parquet(f"{state_dir}/v{k + 1}/bands").count()
            n_arr = batch.count()
            print(f"{k + 1:>4} {n_arr:>9} {len(acc):>9} {nv:>10} {nb:>11} "
                  f"{wall:>7.2f}", flush=True)
            accepted_by_tick.append(acc)
            lo = hi

        t0 = time.monotonic()
        oneshot = {
            r.vec_id
            for r in incremental_embedding_dedup(
                corpus, emb.filter(F.col("vec_id") > corpus_max), dim=dim
            )
            .filter(F.col("origin") == "batch")
            .collect()
        }
        ticked = set().union(*accepted_by_tick)
        ok = oneshot == ticked
        print(f"one-shot ({time.monotonic()-t0:.1f}s): accepted={len(oneshot)}; "
              f"{n_ticks}-tick union={len(ticked)}; "
              f"{'IDENTICAL' if ok else 'MISMATCH ' + str((ticked ^ oneshot))}")
        return ok
    finally:
        shutil.rmtree(state_dir, ignore_errors=True)


def main() -> None:
    args = [a for a in sys.argv[1:]]
    vector = "--vector" in args
    if vector:
        args.remove("--vector")
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    n_ticks = int(args[1]) if len(args) > 1 else 5

    from mistocksync_spark.session import get_spark

    spark = get_spark("merge_ladder")
    ok = (run_vectors if vector else run_docs)(spark, sf_dir, n_ticks)
    spark.stop()
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
