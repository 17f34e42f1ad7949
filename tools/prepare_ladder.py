"""N-tick ladder for the corpus-prepare ingest: split the incremental
batch feed into id-ordered arrival files, run them as successive
`incremental_prepare_tick` calls against accumulating versioned state
(docs + bands, frozen vocabulary — exactly what
streaming/merge.incremental_prepare_stream does per micro-batch), and
report per-tick wall + state size, then assert the unioned decisions are
bit-identical to the one-shot tick.

The reading this produces: tick wall stays flat while the seen-set
grows, because each tick's work is batch/candidate-proportional (the
corpus enters only through the stored band join, the digest shuffle,
and the frozen broadcast vocabulary).

Usage: python tools/prepare_ladder.py [sf_dir] [n_ticks]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

REPO = "/root/repo"
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_ticks = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    from pyspark.sql import functions as F

    from mistocksync_spark.operators.dedup import corpus_signature_state
    from mistocksync_spark.operators.textual import (
        corpus_vocabulary,
        incremental_prepare_tick,
    )
    from mistocksync_spark.plans.feeds import docs_incr_batch, docs_incr_corpus
    from mistocksync_spark.session import get_spark

    spark = get_spark("prepare-ladder")
    work = tempfile.mkdtemp(prefix="prep_ladder_")
    state = os.path.join(work, "state")

    corpus = docs_incr_corpus(spark, sf_dir).select("doc_id", "text")
    batch = docs_incr_batch(spark, sf_dir).select("doc_id", "text")
    ids = sorted(r.doc_id for r in batch.select("doc_id").collect())
    cuts = [ids[(len(ids) * i) // n_ticks] for i in range(1, n_ticks)] + [
        ids[-1] + 1
    ]

    corpus.write.parquet(os.path.join(state, "v0", "docs"))
    corpus_signature_state(corpus).write.parquet(os.path.join(state, "v0", "bands"))
    corpus_vocabulary(corpus).write.parquet(os.path.join(state, "vocab"))
    vocab = spark.read.parquet(os.path.join(state, "vocab"))

    decisions = []
    lo = ids[0]
    for k, hi in enumerate(cuts):
        arrivals = batch.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        docs = spark.read.parquet(os.path.join(state, f"v{k}", "docs"))
        bands = spark.read.parquet(os.path.join(state, f"v{k}", "bands"))
        t0 = time.monotonic()
        dec = incremental_prepare_tick(docs, arrivals, corpus_bands=bands, vocab=vocab)
        dec.write.parquet(os.path.join(state, "decisions", f"b{k}"))
        docs.unionByName(arrivals).write.parquet(
            os.path.join(state, f"v{k + 1}", "docs")
        )
        bands.unionByName(corpus_signature_state(arrivals)).write.parquet(
            os.path.join(state, f"v{k + 1}", "bands")
        )
        wall = time.monotonic() - t0
        n_arr = arrivals.count()
        n_state = docs.count()
        print(
            f"tick {k + 1:2d}: arrivals={n_arr:5d} seen_set={n_state:6d} "
            f"wall={wall:6.2f}s",
            flush=True,
        )
        decisions.append(spark.read.parquet(os.path.join(state, "decisions", f"b{k}")))
        lo = hi

    union = decisions[0]
    for d in decisions[1:]:
        union = union.unionByName(d)
    one_shot = incremental_prepare_tick(corpus, batch)
    u = {(r.doc_id, r.reason) for r in union.collect()}
    o = {(r.doc_id, r.reason) for r in one_shot.collect()}
    print(f"ladder decisions: {len(u)}; one-shot: {len(o)}; identical: {u == o}")
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()
    sys.exit(0 if u == o else 1)


if __name__ == "__main__":
    main()
