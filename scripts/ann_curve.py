"""Recall/latency operating curve for the ANN family (VERDICT r5 #6):
sweep n_probe for IvfIndex (cosine) and IvfPqIndex (squared L2) against
their exact counterparts, so a user can pick an operating point instead
of trusting a single recall test.

Usage: python scripts/ann_curve.py [SF_DIR|clustered] [N_QUERIES]

``clustered`` swaps the parquet corpus for a synthetic 2000x64
20-cluster corpus — testdata embeddings are near-uniform random (the
WORST case for cell-pruned ANN: the true top-10 scatters across many
cells), so the pair of tables brackets the realistic range.

Prints a markdown table: per index type x n_probe, mean recall@10 over
the query set and mean warm per-probe wall seconds.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))

import numpy as np

from streaming_data_pipeline_azure_spark.operators import similarity as sim
from streaming_data_pipeline_azure_spark.session import get_spark

N_PROBES = [1, 2, 4, 8, 16]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    spark = get_spark("ann_curve")
    if sf_dir == "clustered":
        rng = np.random.default_rng(11)
        centers = rng.normal(0, 4.0, size=(20, 64))
        data = [
            (int(c * 1000 + i), [float(x) for x in centers[c] + rng.normal(0, 1.0, 64)])
            for c in range(20)
            for i in range(100)
        ]
        emb = spark.createDataFrame(
            data, "vec_id long, embedding array<double>"
        )
    else:
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rows = emb.collect()  # sf0.1: 2k vectors — exact reference needs them
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.array([[float(x) for x in r["embedding"]] for r in rows])
    stride = max(1, len(rows) // n_queries)  # spread queries over corpus
    pick = list(range(0, len(rows), stride))[:n_queries]
    queries = {int(ids[i]): mat[i] for i in pick}

    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0

    def exact_cosine(q):
        qn = np.linalg.norm(q) or 1.0
        return set(ids[np.argsort(-(mat @ q) / (norms * qn), kind="stable")[:10]])

    def exact_l2(q):
        return set(ids[np.argsort(((mat - q) ** 2).sum(axis=1), kind="stable")[:10]])

    import tempfile

    ivf = sim.IvfIndex(tempfile.mkdtemp() + "/ivf")
    ivf.build(emb, "embedding")
    ivfpq = sim.IvfPqIndex(tempfile.mkdtemp() + "/ivfpq")
    ivfpq.build(emb, "embedding")

    # warm both probe paths once so the first timed row isn't codegen
    q0 = next(iter(queries.values()))
    ivf.probe(spark, [float(x) for x in q0], k=10, n_probe=2).collect()
    ivfpq.probe(spark, [float(x) for x in q0], k=10, n_probe=2).collect()

    print(f"| index | n_probe | recall@10 | probe sec (warm mean) |")
    print(f"|---|---|---|---|")
    for label, idx, exact, kwargs in (
        ("IVF (cosine)", ivf, exact_cosine, {}),
        ("IVF-PQ (sq-L2)", ivfpq, exact_l2, {}),
        (
            "IVF-PQ + rerank 50",
            ivfpq,
            exact_l2,
            {"rerank": 50, "vectors": emb},
        ),
    ):
        for n_probe in N_PROBES:
            hits, t_total = 0, 0.0
            for qid, q in queries.items():
                qv = [float(x) for x in q]
                t0 = time.perf_counter()
                got = {
                    r["vec_id"]
                    for r in idx.probe(
                        spark, qv, k=10, n_probe=n_probe, **kwargs
                    ).collect()
                }
                t_total += time.perf_counter() - t0
                hits += len(got & exact(q))
            recall = hits / (10 * len(queries))
            print(
                f"| {label} | {n_probe} | {recall:.3f} "
                f"| {t_total / len(queries):.3f} |"
            )


if __name__ == "__main__":
    main()
