"""Generate schema-compatible synthetic tables at an arbitrary scale
factor, for SCALE benching only (the driver's own /root/testdata sf dirs
remain the correctness fixtures; this data matches their schemas and
value distributions but NOT their exact seeded content — fixed-value
oracles are meaningless against it).

Usage: python scratch/gen_sf.py --sf 1.0 --out /root/repo/.sfdata/sf1.0

Row counts scale linearly from the driver's sf0.1 (lineitem = 6M rows/sf,
documents = 500k rows/sf... see COUNTS). Deterministic (numpy PCG64,
seed 42); vocabulary, language mix, FK structure, timestamp ranges, and
the ~0.2% exact-duplicate rate mirror the sf0.1 fixture so operator work
per row is comparable.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# rows per unit scale factor (sf0.1 fixture × 10)
COUNTS = {
    "customer": 150_000,
    "supplier": 10_000,
    "part": 200_000,
    "orders": 1_500_000,
    "lineitem": 6_000_000,
    "events": 1_000_000,
    "documents": 50_000,
    "embeddings": 20_000,
}

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
NATIONS = [
    "ALGERIA", "ARGENTINA", "BRAZIL", "CANADA", "EGYPT", "ETHIOPIA",
    "FRANCE", "GERMANY", "INDIA", "INDONESIA", "IRAN", "IRAQ", "JAPAN",
    "JORDAN", "KENYA", "MOROCCO", "MOZAMBIQUE", "PERU", "CHINA",
    "ROMANIA", "SAUDI ARABIA", "VIETNAM", "RUSSIA", "UNITED KINGDOM",
    "UNITED STATES",
]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
BRANDS = [f"Brand#{i}{j}" for i in range(1, 6) for j in range(1, 6)]
TYPES = [
    f"{a} {b} {c}"
    for a in ("STANDARD", "SMALL", "MEDIUM", "LARGE", "ECONOMY", "PROMO")
    for b in ("ANODIZED", "BURNISHED", "PLATED", "POLISHED", "BRUSHED")
    for c in ("TIN", "NICKEL", "BRASS", "STEEL", "COPPER")
]
EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]
VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]
LANGS = ["en", "de", "fr", "es", "zh"]
LANG_P = [0.41, 0.14, 0.15, 0.15, 0.15]


def write(out_dir: str, name: str, table: pa.Table) -> None:
    path = os.path.join(out_dir, f"{name}.parquet")
    pq.write_table(table, path, compression="snappy", row_group_size=200_000)
    print(f"wrote {name}: {table.num_rows} rows -> {path}", flush=True)


def zipf_tokens(rng: np.random.Generator, total: int,
                v: int = 50_000, s: float = 1.1) -> np.ndarray:
    """Heavy-tailed token stream: vocabulary of ``v`` synthetic words
    with Zipf rank-frequency p(rank) ∝ rank^-s — the realistic text
    regime (the default 31-word dense vocabulary is the ADVERSARIAL
    regime for LSH banding probes: every shingle collides; PLANS.md
    round-7 notes it as good stress, unrepresentative density; VERDICT
    r7 item 7 asks for this counterpart). Inverse-CDF sampling via
    searchsorted (np.random.choice with a 50k-entry p is slow)."""
    ranks = np.arange(1, v + 1, dtype="float64")
    p = ranks ** -s
    cdf = np.cumsum(p / p.sum())
    idx = np.searchsorted(cdf, rng.random(total), side="right")
    words = np.array([f"w{i}" for i in range(v)])
    return words[np.minimum(idx, v - 1)]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--out", required=True)
    ap.add_argument(
        "--vocab", choices=("dense", "zipf"), default="dense",
        help="documents vocabulary: dense = the 31-word high-collision "
        "stress regime (default, matches prior rounds' tables); zipf = "
        "50k-word heavy-tailed realistic regime",
    )
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    rng = np.random.default_rng(42)
    n = {k: max(1, int(v * args.sf)) for k, v in COUNTS.items()}

    write(args.out, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    nat_region = rng.integers(0, 5, 25)
    write(args.out, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": NATIONS,
        "n_regionkey": pa.array(nat_region, pa.int32()),
    }))

    nc = n["customer"]
    write(args.out, "customer", pa.table({
        "c_custkey": pa.array(np.arange(1, nc + 1), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(1, nc + 1)],
        "c_nationkey": pa.array(rng.integers(0, 25, nc), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-999.99, 9999.99, nc), 2),
        "c_mktsegment": np.array(SEGMENTS)[rng.integers(0, 5, nc)],
    }))

    ns = n["supplier"]
    write(args.out, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(1, ns + 1), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(1, ns + 1)],
        "s_nationkey": pa.array(rng.integers(0, 25, ns), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-999.99, 9999.99, ns), 2),
    }))

    npart = n["part"]
    widx = rng.integers(0, len(VOCAB), (npart, 3))
    write(args.out, "part", pa.table({
        "p_partkey": pa.array(np.arange(1, npart + 1), pa.int64()),
        "p_name": [" ".join(VOCAB[j] for j in row) for row in widx],
        "p_brand": np.array(BRANDS)[rng.integers(0, len(BRANDS), npart)],
        "p_type": np.array(TYPES)[rng.integers(0, len(TYPES), npart)],
        "p_size": pa.array(rng.integers(1, 51, npart), pa.int32()),
        "p_retailprice": np.round(rng.uniform(900.0, 2000.0, npart), 2),
    }))

    no = n["orders"]
    base = np.datetime64("1995-01-01")
    odate_days = rng.integers(0, 2404, no)  # 1995-01-01 .. 2001-08-01
    odates = base + odate_days.astype("timedelta64[D]")
    write(args.out, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(1, no + 1), pa.int64()),
        "o_custkey": pa.array(rng.integers(1, nc + 1, no), pa.int64()),
        "o_orderstatus": np.array(["F", "O", "P"])[rng.integers(0, 3, no)],
        "o_totalprice": np.round(rng.uniform(850.0, 560000.0, no), 2),
        "o_orderdate": pa.array(odates.astype("datetime64[us]"),
                                pa.timestamp("us")),
        "o_orderpriority": np.array(PRIORITIES)[rng.integers(0, 5, no)],
    }))

    nl = n["lineitem"]
    l_orderkey = rng.integers(1, no + 1, nl)
    l_orderkey.sort()
    ship = (base + odate_days[l_orderkey - 1].astype("timedelta64[D]")
            + rng.integers(1, 95, nl).astype("timedelta64[D]"))
    # linenumber: position within its order
    _, first_idx, counts = np.unique(l_orderkey, return_index=True,
                                     return_counts=True)
    linenumber = np.arange(nl) - np.repeat(first_idx, counts) + 1
    write(args.out, "lineitem", pa.table({
        "l_orderkey": pa.array(l_orderkey, pa.int64()),
        "l_partkey": pa.array(rng.integers(1, npart + 1, nl), pa.int64()),
        "l_suppkey": pa.array(rng.integers(1, ns + 1, nl), pa.int64()),
        "l_linenumber": pa.array(linenumber, pa.int32()),
        "l_quantity": rng.integers(1, 51, nl).astype("float64"),
        "l_extendedprice": np.round(rng.uniform(900.0, 100000.0, nl), 2),
        "l_discount": np.round(rng.integers(0, 11, nl) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, nl) / 100.0, 2),
        "l_returnflag": np.array(["A", "N", "R"])[rng.integers(0, 3, nl)],
        "l_linestatus": np.array(["F", "O"])[rng.integers(0, 2, nl)],
        "l_shipdate": pa.array(ship.astype("datetime64[us]"),
                               pa.timestamp("us")),
    }))

    ne = n["events"]
    ev_base = np.datetime64("2024-01-01T00:00:00.000000")
    ev_us = rng.integers(0, 30 * 86400 * 1_000_000, ne, dtype=np.int64)
    ev_us.sort()
    write(args.out, "events", pa.table({
        "event_id": pa.array(np.arange(1, ne + 1), pa.int64()),
        "ts": pa.array(ev_base + ev_us.astype("timedelta64[us]"),
                       pa.timestamp("us")),
        "user_id": pa.array(rng.integers(1, max(2, ne // 66) + 1, ne),
                            pa.int64()),
        "event_type": np.array(EVENT_TYPES)[rng.integers(0, 5, ne)],
        "value": np.round(rng.uniform(0.0, 100.0, ne), 4),
        "props": [f'{{"k": {int(v)}}}' for v in rng.integers(0, 100, ne)],
    }))

    nd = n["documents"]
    lang = np.array(LANGS)[rng.choice(5, nd, p=LANG_P)]
    source = np.array([f"src{i}" for i in range(20)])[
        rng.integers(0, 20, nd)
    ]
    lens = rng.integers(10, 111, nd)
    texts: list[str] = []
    if args.vocab == "zipf":
        stream = zipf_tokens(rng, int(lens.sum()))
        off = 0
        for i in range(nd):
            ln = int(lens[i])
            if i > 0 and i % 613 == 0:  # same dup rate as dense mode
                texts.append(texts[i - 1])
                off += ln
                continue
            texts.append(" ".join(stream[off:off + ln]))
            off += ln
    else:
        vocab_arr = np.array(VOCAB)
        for i in range(nd):
            if i > 0 and i % 613 == 0:  # ~0.16% exact duplicates (dedup work)
                texts.append(texts[i - 1])
                continue
            toks = vocab_arr[rng.integers(0, len(VOCAB), lens[i])]
            texts.append(" ".join(toks))
    write(args.out, "documents", pa.table({
        "doc_id": pa.array(np.arange(nd), pa.int64()),
        "text": texts,
        "lang": lang,
        "source": source,
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    nv = n["embeddings"]
    emb = rng.normal(0, 1, (nv, 64)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    write(args.out, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(nv), pa.int64()),
        "embedding": pa.array(list(emb), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, nv), pa.int32()),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
