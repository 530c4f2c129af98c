"""Core-count scaling probe on an UPSCALED synthetic corpus (r17,
VERDICT item 3): the sf0.1 roster is overhead-bound (every headline
query sub-2 s), so 8-vs-32-core ratios there measure fixed per-job cost,
not parallelism. This probe rebuilds the heavy changed ops' inputs at a
size where compute dominates and times each op at two core counts in
SEPARATE processes (clean local[N] sessions), reporting the speedup.

Synthetic data (deterministic, derived from sf0.1, cached under
.scratch/sfsynth-d<D>v<V>/):
- documents x D (default 8): replica k prefixes every word with "r<k>x"
  — per-replica token spaces are DISJOINT, so gram/postings ops scale
  linearly in D with zero cross-replica near-dup pairs (verbatim copies
  would explode the pair space quadratically and measure the wrong
  thing).
- embeddings x V (default 2): replica k flips the sign of dimension i
  iff bit (i % 31) of (k * 2654435761) is set — norms and labels are
  preserved, cross-replica cosines decorrelate, and dd12's within-cell
  pair compute grows ~V^2 (cells are fixed-K k-means over the union),
  which is why V stays small.

Usage:
  python tools/core_scaling_probe.py [--cores 8,32] [--n 3] [op ...]
  (default ops: dd02_ngram_jaccard dd12_semdedup dd19_containment
   tx15_bpe_train ss09_ann_recall)

Each leg runs `--leg <cores>` in a subprocess and prints one JSON line;
the parent assembles the table. Warm medians of --n runs after one
warmup (the warmup builds session-persisted indexes; its time is
reported as "cold").
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC_SF = "/root/testdata/sf0.1"
DEFAULT_OPS = [
    "dd02_ngram_jaccard",
    "dd12_semdedup",
    "dd19_containment",
    "tx15_bpe_train",
    "ss09_ann_recall",
]


def synth_dir(d_rep: int, v_rep: int) -> str:
    return os.path.join(REPO, ".scratch", f"sfsynth-d{d_rep}v{v_rep}")


def build_synth(d_rep: int, v_rep: int) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = synth_dir(d_rep, v_rep)
    marker = os.path.join(out, "_BUILT")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)

    docs = pq.read_table(os.path.join(SRC_SF, "documents.parquet"))
    base_ids = docs.column("doc_id").to_pylist()
    base_text = docs.column("text").to_pylist()
    other = {
        name: docs.column(name).to_pylist()
        for name in docs.schema.names
        if name not in ("doc_id", "text")
    }
    ids, texts = [], []
    extra = {k: [] for k in other}
    for k in range(d_rep):
        off = k * 10_000_000
        ids.extend(i + off for i in base_ids)
        if k == 0:
            texts.extend(base_text)
        else:
            pre = f"r{k}x"
            texts.extend(
                " ".join(pre + w for w in t.split(" ")) for t in base_text
            )
        for name, vals in other.items():
            extra[name].extend(vals)
    cols = {"doc_id": ids, "text": texts, **extra}
    tbl = pa.table({n: cols[n] for n in docs.schema.names})
    pq.write_table(
        tbl,
        os.path.join(out, "documents.parquet"),
        row_group_size=max(1024, tbl.num_rows // 64),
    )

    emb = pq.read_table(os.path.join(SRC_SF, "embeddings.parquet"))
    vids = emb.column("vec_id").to_pylist()
    vecs = emb.column("embedding").to_pylist()
    labels = emb.column("label").to_pylist()
    out_ids, out_vecs, out_labels = [], [], []
    for k in range(v_rep):
        off = k * 10_000_000
        out_ids.extend(v + off for v in vids)
        out_labels.extend(labels)
        if k == 0:
            out_vecs.extend(vecs)
        else:
            bits = k * 2654435761
            signs = [(-1.0 if (bits >> (i % 31)) & 1 else 1.0) for i in range(256)]
            out_vecs.extend(
                [x * signs[i] for i, x in enumerate(v)] for v in vecs
            )
    tbl = pa.table(
        {
            "vec_id": pa.array(out_ids, pa.int64()),
            "embedding": pa.array(out_vecs, pa.list_(pa.float32())),
            "label": pa.array(out_labels, pa.int32()),
        }
    )
    pq.write_table(
        tbl,
        os.path.join(out, "embeddings.parquet"),
        row_group_size=max(256, tbl.num_rows // 64),
    )
    with open(marker, "w") as fh:
        fh.write("ok")
    return out


def run_leg(cores: int, sf_dir: str, ops: list[str], n: int, mode: str) -> None:
    from hive_lineage_spark.session import get_spark
    from hive_lineage_spark.operators.dedup import clear_postings_cache

    import __spark_entry__ as entrymod

    spark = get_spark(f"scaleprobe{cores}", cpus=cores)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    # absorb session/JIT/codegen warmup outside any timed run
    qs["q16_topk"](spark, SRC_SF).write.format("noop").mode("overwrite").save()
    out = {}
    for name in ops:
        spark.sparkContext.setJobDescription(f"scaleprobe:{name}")
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        cold = time.perf_counter() - t0
        runs = []
        for _ in range(n):
            if mode == "cold":
                # each sample re-pays the session-persisted index builds:
                # THAT is where the fan-out/salting parallelism claims
                # live (warm runs only read the cached artifacts)
                clear_postings_cache()
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        out[name] = {
            "cold": round(cold, 2),
            "warm": round(statistics.median(runs), 2),
            "min": round(min(runs), 2),
        }
    print("LEG " + json.dumps({"cores": cores, "ops": out}))
    spark.stop()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", default="8,32")
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("--docs-rep", type=int, default=8)
    ap.add_argument("--vecs-rep", type=int, default=2)
    ap.add_argument("--mode", default="cold", choices=["cold", "warm"])
    ap.add_argument("--sf", default=None, help="probe a real sf dir instead of the synthetic corpus (e.g. the decode fixtures at sf0.1)")
    ap.add_argument("--leg", type=int, default=None, help="internal: run one leg")
    ap.add_argument("ops", nargs="*", default=None)
    args = ap.parse_args()
    ops = args.ops or DEFAULT_OPS

    sf_dir = args.sf or build_synth(args.docs_rep, args.vecs_rep)
    if args.leg is not None:
        run_leg(args.leg, sf_dir, ops, args.n, args.mode)
        return 0

    legs = {}
    for cores in [int(c) for c in args.cores.split(",")]:
        cmd = [
            sys.executable, os.path.abspath(__file__),
            "--leg", str(cores), "--n", str(args.n), "--mode", args.mode,
            *(["--sf", args.sf] if args.sf else []),
            "--docs-rep", str(args.docs_rep), "--vecs-rep", str(args.vecs_rep),
            *ops,
        ]
        proc = subprocess.run(cmd, capture_output=True, text=True)
        for line in proc.stdout.splitlines():
            if line.startswith("LEG "):
                leg = json.loads(line[4:])
                legs[leg["cores"]] = leg["ops"]
        if proc.returncode != 0:
            sys.stderr.write(proc.stderr[-2000:])
            return 1
    cores_sorted = sorted(legs)
    if len(cores_sorted) == 2:
        lo, hi = cores_sorted
        print(f"{'op':28s} {lo:>4}c med {hi:>4}c med  ratio   {lo}c first {hi}c first  (mode={args.mode})")
        for name in ops:
            a, b = legs[lo][name], legs[hi][name]
            ratio = round(a["warm"] / b["warm"], 2) if b["warm"] else float("nan")
            print(
                f"{name:28s} {a['warm']:9.2f} {b['warm']:9.2f} {ratio:6.2f} "
                f"{a['cold']:8.2f} {b['cold']:8.2f}"
            )
    print("RESULT " + json.dumps(legs))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
