"""Deterministic scale-ladder data generator for sweeps above the driver's
sf0.1 ceiling (VERDICT r8/r9 ask: "run the full registry at sf1").

The driver's /root/testdata is read-only and tops out at sf0.1, so this
script regenerates the same ten-table schema at an arbitrary sf under
/root/repo/.scaledata/sf{sf}/ (gitignored).  It matches the driver tables'
schema exactly (verified against duckdb DESCRIBE of sf0.01/sf0.1) and the
same distribution *shape* (row-count ratios, value ranges, vocabulary,
dup-rate, cluster structure) — NOT the same seed/rows.  That is sufficient
because tools/check.py is a self-consistency gate: it runs each Spark query
and its DuckDB oracle over the SAME parquet files, so any schema-faithful
data exercises the full registry at scale.

Row-count model (fitted to sf0.001/0.01/0.1):
    customer 150_000*sf   supplier 10_000*sf   part 200_000*sf
    orders 1_500_000*sf   lineitem ~4.07 lines/order (~6_100_000*sf)
    events 1_000_000*sf (users 15_000*sf)
    documents max(500, 50_000*sf)   embeddings max(500, 20_000*sf)

Usage: python tools/gen_scaledata.py [sf] [outdir] [--zipf]

--zipf (round 11): realistic, CORPUS-SCALING vocabulary mode.  The default
mode draws document tokens uniformly from a CLOSED 31-word vocabulary, so
shingle-bucket occupancy grows linearly with the corpus and every
candidate-volume dedup operator goes quadratic for *data* reasons (the
r10 sweep measured MinHash candidates 34x / SimHash pairs 65x on 10x docs
while verified outputs stayed ~linear).  Real text doesn't behave that
way: vocabulary grows with the corpus (Heaps' law, V ~ k*N^0.5) and token
frequencies are Zipf-distributed, so per-shingle bucket occupancy stays
~flat as the corpus grows.  --zipf models exactly that:

  - documents: tokens drawn Zipf-Mandelbrot (s=1.07, q=2.7 — standard
    English fits) over a pseudo-word vocabulary sized by Heaps' law from
    the expected token count (>=10^4 types at sf1, the r10 verdict ask);
    the planted exact/near-dup pairs are unchanged.
  - embeddings: cluster count scales with the corpus (one cluster per
    ~200 vectors) instead of the fixed 10, keeping cluster density — and
    hence genuine near-neighbor volume per vector — constant across sf.
  - part names: adjective/noun pools scale ~sqrt(n_part), so distinct
    name count grows with the catalog and per-name repetition stays flat
    (a real catalog's shape), instead of 64 names repeated n/64 times.

Schema is identical to the default mode; only the value distributions
change.  Used for the SCALE_r11 candidate-volume re-measurement.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 20260815

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
ADJ = ["red", "blue", "green", "small", "large", "shiny", "matte", "spare"]
NOUN = ["ring", "widget", "bolt", "gear", "cap", "valve", "pin", "plate"]
EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]
LANGS = ["en", "de", "zh", "fr", "es"]
LANG_W = [0.41, 0.14, 0.15, 0.15, 0.15]

DAY_US = 86_400_000_000

# --zipf pseudo-word alphabet: CV syllables, 85 combos/syllable, 2-4
# syllables => ~52M possible words, so uniqueness never stalls.
_CONS = "bcdfghjklmnprstvz"
_VOWS = "aeiou"


def _pseudo_words(rng: np.random.Generator, count: int, taken=()) -> list[str]:
    """``count`` distinct deterministic pseudo-words (lowercase, letter-only
    so the tokenizers/shinglers treat them exactly like the base VOCAB)."""
    words: list[str] = []
    seen = set(taken)
    while len(words) < count:
        k = count - len(words)
        n_syll = rng.integers(2, 5, k)
        ci = rng.integers(0, len(_CONS), int(n_syll.sum()))
        vi = rng.integers(0, len(_VOWS), int(n_syll.sum()))
        off = 0
        for ns in n_syll:
            w = "".join(
                _CONS[ci[off + j]] + _VOWS[vi[off + j]] for j in range(ns)
            )
            off += ns
            if w not in seen:
                seen.add(w)
                words.append(w)
    return words


def _ts_us(arr_us: np.ndarray) -> pa.Array:
    return pa.array(arr_us.astype("int64"), type=pa.int64()).cast(
        pa.timestamp("us")
    )


def _write(outdir: str, name: str, table: pa.Table) -> None:
    path = os.path.join(outdir, f"{name}.parquet")
    pq.write_table(table, path, compression="snappy")
    print(f"  {name}: {table.num_rows} rows -> {path}", flush=True)


def generate(sf: float, outdir: str, zipf: bool = False) -> None:
    rng = np.random.default_rng(SEED)
    os.makedirs(outdir, exist_ok=True)

    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_evt = int(1_000_000 * sf)
    n_users = int(15_000 * sf)
    n_doc = max(500, int(50_000 * sf))
    n_emb = max(500, int(20_000 * sf))

    # region / nation: fixed dimension content, copied shape from TPC-H.
    regions = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
    _write(outdir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": regions,
    }))
    nations = [
        "ALGERIA", "ARGENTINA", "BRAZIL", "CANADA", "EGYPT", "ETHIOPIA",
        "FRANCE", "GERMANY", "INDIA", "INDONESIA", "IRAN", "IRAQ", "JAPAN",
        "JORDAN", "KENYA", "MOROCCO", "MOZAMBIQUE", "PERU", "CHINA",
        "ROMANIA", "SAUDI ARABIA", "VIETNAM", "RUSSIA", "UNITED KINGDOM",
        "UNITED STATES",
    ]
    _write(outdir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": nations,
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    _write(outdir, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust, dtype="int64")),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(
            rng.integers(0, 25, n_cust, dtype="int32"), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-1000.0, 10000.0, n_cust), 2),
        "c_mktsegment": pa.array(
            np.array(SEGMENTS)[rng.integers(0, 5, n_cust)]),
    }))

    _write(outdir, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp, dtype="int64")),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(
            rng.integers(0, 25, n_supp, dtype="int32"), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-1000.0, 10000.0, n_supp), 2),
    }))

    pk = np.arange(n_part, dtype="int64")
    adj, noun = list(ADJ), list(NOUN)
    if zipf:
        # name diversity grows ~sqrt(catalog): distinct names ~ n_part/32,
        # per-name repetition stays flat across sf instead of n_part/64.
        n_pool = max(8, int(round(8 * (n_part / 2000.0) ** 0.5)))
        adj = adj + _pseudo_words(rng, n_pool - 8, taken=adj)
        noun = noun + _pseudo_words(rng, n_pool - 8, taken=adj + noun)
    _write(outdir, "part", pa.table({
        "p_partkey": pa.array(pk),
        "p_name": [
            f"{adj[a]} {noun[b]}"
            for a, b in zip(rng.integers(0, len(adj), n_part),
                            rng.integers(0, len(noun), n_part))
        ],
        "p_brand": [f"Brand#{i}" for i in rng.integers(0, 25, n_part)],
        "p_type": pa.array(np.array(PTYPES)[rng.integers(0, 6, n_part)]),
        "p_size": pa.array(
            rng.integers(1, 51, n_part, dtype="int32"), pa.int32()),
        "p_retailprice": 900.0 + (pk % 1000) / 10.0,
    }))

    # orders: orderdate uniform midnight-days over 1995-01-01..2001-08-01.
    epoch_1995 = np.datetime64("1995-01-01").astype(
        "datetime64[us]").astype("int64")
    n_days = int((np.datetime64("2001-08-01") - np.datetime64("1995-01-01"))
                 / np.timedelta64(1, "D"))
    odate_day = rng.integers(0, n_days + 1, n_ord, dtype="int64")
    odate_us = epoch_1995 + odate_day * DAY_US
    _write(outdir, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord, dtype="int64")),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord, dtype="int64")),
        "o_orderstatus": pa.array(
            np.array(["O", "F", "P"])[rng.integers(0, 3, n_ord)]),
        "o_totalprice": np.round(rng.uniform(1000.0, 500000.0, n_ord), 2),
        "o_orderdate": _ts_us(odate_us),
        "o_orderpriority": pa.array(
            np.array(PRIORITIES)[rng.integers(0, 5, n_ord)]),
    }))

    # lineitem: 1 + Poisson(3.075) lines per order (matches the observed
    # min 1 / avg 4.07 / max ~17 of the driver tables).
    lines_per = 1 + rng.poisson(3.075, n_ord)
    n_li = int(lines_per.sum())
    l_orderkey = np.repeat(np.arange(n_ord, dtype="int64"), lines_per)
    l_linenumber = (np.arange(n_li, dtype="int64")
                    - np.repeat(np.cumsum(lines_per) - lines_per, lines_per)
                    + 1).astype("int32")
    ship_us = (np.repeat(odate_us, lines_per)
               + rng.integers(1, 96, n_li, dtype="int64") * DAY_US)
    _write(outdir, "lineitem", pa.table({
        "l_orderkey": pa.array(l_orderkey),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li, dtype="int64")),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li, dtype="int64")),
        "l_linenumber": pa.array(l_linenumber, pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype("float64"),
        "l_extendedprice": np.round(rng.uniform(900.0, 105000.0, n_li), 2),
        "l_discount": rng.integers(0, 11, n_li) / 100.0,
        "l_tax": rng.integers(0, 9, n_li) / 100.0,
        "l_returnflag": pa.array(
            np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)]),
        "l_linestatus": pa.array(
            np.array(["O", "F"])[rng.integers(0, 2, n_li)]),
        "l_shipdate": _ts_us(ship_us),
    }))

    # events: January-2024 stream, uniform users, light long-tail values.
    epoch_2024 = np.datetime64("2024-01-01").astype(
        "datetime64[us]").astype("int64")
    ts_us = epoch_2024 + rng.integers(
        0, 30 * DAY_US, n_evt, dtype="int64")
    _write(outdir, "events", pa.table({
        "event_id": pa.array(np.arange(n_evt, dtype="int64")),
        "ts": _ts_us(ts_us),
        "user_id": pa.array(rng.integers(0, n_users, n_evt, dtype="int64")),
        "event_type": pa.array(
            np.array(EVENT_TYPES)[
                rng.choice(5, n_evt, p=[0.3, 0.3, 0.1, 0.1, 0.2])]),
        "value": np.round(
            np.minimum(rng.exponential(60.0, n_evt), 560.21), 2),
        "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, n_evt)],
    }))

    # documents: word-salad over the driver vocabulary, 10..100 words,
    # ~0.2% exact dups + ~0.2% one-word-mutated near-dups so the dedup /
    # LSH / simhash operators have real positives to find at scale.
    n_words = rng.integers(10, 101, n_doc)
    if zipf:
        # Heaps-sized vocabulary (V = 18*sqrt(N), >=2000): sf1's ~2.75M
        # tokens give ~30k types; Zipf-Mandelbrot token draw (s=1.07,
        # q=2.7).  Shingle space then grows with the corpus and bucket
        # occupancy stays ~flat — the real-text statistics the
        # candidate-volume dedup family banks on at 100 TB.
        total = int(n_words.sum())
        v_size = max(2000, int(18 * total ** 0.5))
        vocab = np.array(_pseudo_words(rng, v_size))
        ranks = np.arange(1, v_size + 1, dtype="float64")
        p = 1.0 / (ranks + 2.7) ** 1.07
        p /= p.sum()
        toks = vocab[rng.choice(v_size, total, p=p)]
        bounds = np.cumsum(n_words)[:-1]
        texts = [" ".join(chunk) for chunk in np.split(toks, bounds)]
        print(f"  (zipf vocab: {v_size} types over {total} tokens)", flush=True)
    else:
        vocab = np.array(VOCAB)
        texts = [
            " ".join(vocab[rng.integers(0, len(vocab), k)]) for k in n_words
        ]
    n_pair = max(4, n_doc // 500)
    for i in range(n_pair):
        src, dst = rng.integers(0, n_doc, 2)
        texts[dst] = texts[src]                      # exact dup
        src2, dst2 = rng.integers(0, n_doc, 2)
        w = texts[src2].split()
        w[rng.integers(0, len(w))] = str(vocab[rng.integers(0, len(vocab))])
        texts[dst2] = " ".join(w)                    # near dup
    _write(outdir, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_doc, dtype="int64")),
        "text": texts,
        "lang": pa.array(
            np.array(LANGS)[rng.choice(5, n_doc, p=LANG_W)]),
        "source": [f"src{i % 20}" for i in range(n_doc)],
        "n_chars": pa.array(
            np.array([len(t) for t in texts], dtype="int64")),
    }))

    # embeddings: Gaussian clusters in 64-d (label == cluster), same
    # coordinate scale as the driver tables (|x| < ~0.58).  Default: the
    # driver's fixed 10 clusters; --zipf: one cluster per ~200 vectors so
    # cluster density — and genuine near-neighbor volume per vector —
    # stays constant as the corpus grows (fixed-count clusters make the
    # within-cluster pair count quadratic in sf, a data artifact).
    n_clusters = max(10, n_emb // 200) if zipf else 10
    centers = rng.normal(0.0, 0.15, (n_clusters, 64))
    label = rng.integers(0, n_clusters, n_emb, dtype="int32")
    emb = (centers[label] + rng.normal(0.0, 0.08, (n_emb, 64))).clip(
        -0.577, 0.577).astype("float32")
    _write(outdir, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_emb, dtype="int64")),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(emb.reshape(-1), pa.float32()), 64).cast(
                pa.list_(pa.float32())),
        "label": pa.array(label, pa.int32()),
    }))


def main() -> None:
    args = [a for a in sys.argv[1:]]
    zipf = "--zipf" in args
    if zipf:
        args.remove("--zipf")
    sf = float(args[0]) if args else 1.0
    prefix = "zipf-" if zipf else ""
    outdir = (args[1] if len(args) > 1
              else f"/root/repo/.scaledata/{prefix}sf{sf:g}")
    print(f"generating sf={sf:g} zipf={zipf} -> {outdir}", flush=True)
    generate(sf, outdir, zipf=zipf)
    print("done", flush=True)


if __name__ == "__main__":
    main()
