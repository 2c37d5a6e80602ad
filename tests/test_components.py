"""Connected-components dedup clustering + IVF ANN.

The components operator is differentially checked two ways: handcrafted
graphs with known components here (chains — the case pairwise loser
rules get wrong — cycles, bridges, isolates), and the DuckDB
recursive-CTE transitive closure in the oracle gate (dedup_components).
The IVF test restates the whole operator independently in pure Python
(sequential-fold dot products, half-up rounding — the exact arithmetic
both engines use) and requires row-identical output.
"""

import math
from decimal import ROUND_HALF_UP, Decimal

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .appName("smartreader-components-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "8g")
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


def _components(spark, n_vertices, edge_list):
    from smartreader_spark.functions.components import connected_components

    verts = spark.createDataFrame(
        [(i,) for i in range(n_vertices)], "doc_id long"
    )
    edges = spark.createDataFrame(
        [(a, b) for a, b in edge_list] or [(0, 0)], "doc_a long, doc_b long"
    )
    if not edge_list:
        edges = edges.limit(0)
    out = connected_components(verts, edges)
    return {r["doc_id"]: r["component"] for r in out.collect()}


def test_components_chain_keeps_one_survivor(spark):
    # A~B, B~C, C~D near-dup chain: pairwise loser-drop would kill B, C
    # AND D; component semantics keeps exactly one representative (0)
    got = _components(spark, 6, [(0, 1), (1, 2), (2, 3)])
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 4, 5: 5}


def test_components_cycle_and_bridge(spark):
    # cycle 0-1-2-0, star at 5 bridged to the cycle via (2, 5), pair 7-8
    got = _components(
        spark, 9, [(0, 1), (1, 2), (2, 0), (5, 6), (2, 5), (7, 8)]
    )
    assert got == {0: 0, 1: 0, 2: 0, 5: 0, 6: 0, 3: 3, 4: 4, 7: 7, 8: 7}


def test_components_long_path_converges(spark):
    # a 64-vertex path is the worst case for naive min propagation
    # (diameter 63); pointer jumping must converge inside MAX_ITER=25
    n = 64
    got = _components(spark, n, [(i, i + 1) for i in range(n - 1)])
    assert got == {i: 0 for i in range(n)}


def test_components_no_edges_is_identity(spark):
    got = _components(spark, 5, [])
    assert got == {i: i for i in range(5)}


def test_dedup_components_labels_every_document(spark):
    from smartreader_spark.functions.components import dedup_components

    out = dedup_components(spark, SF).collect()
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert len(out) == n_docs
    comps = {r["component"] for r in out}
    # every component label is the id of its own canonical member
    canon = {r["doc_id"] for r in out if r["is_canonical"]}
    assert comps == canon
    by_id = {r["doc_id"]: r["component"] for r in out}
    # the representative is the minimum id in its component
    for r in out:
        assert r["component"] <= r["doc_id"]
        assert by_id[r["component"]] == r["component"]


def _round6(x: float) -> float:
    # Spark's F.round / DuckDB round: HALF_UP at the 6th decimal
    return float(Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP))


def _dot(a, b):
    # sequential left fold — the exact order F.aggregate(zip_with(...))
    # and DuckDB's list_dot_product evaluate in
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y
    return acc


def _cos(a, b):
    return _dot(a, b) / (math.sqrt(_dot(a, a)) * math.sqrt(_dot(b, b)))


def test_ivf_topk_matches_pure_python_restatement(spark):
    from smartreader_spark.functions.similarity import (
        DEFAULT_K,
        DEFAULT_QUERIES,
        IVF_CELLS,
        IVF_NPROBE,
        ivf_topk,
    )

    rows = (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .select("vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("e"))
        .collect()
    )
    vecs = {r["vec_id"]: r["e"] for r in rows}
    cents = [vecs[i] for i in range(DEFAULT_QUERIES, DEFAULT_QUERIES + IVF_CELLS)]

    def cell_ranking(v):
        # (rounded score desc, cell asc)
        return sorted(
            ((_round6(_cos(v, c)), cell) for cell, c in enumerate(cents)),
            key=lambda t: (-t[0], t[1]),
        )

    assign = {vid: cell_ranking(v)[0][1] for vid, v in vecs.items()}
    expected = []
    for q in range(DEFAULT_QUERIES):
        probed = {cell for _, cell in cell_ranking(vecs[q])[:IVF_NPROBE]}
        cand = [
            (vid, _round6(_cos(vecs[q], v)))
            for vid, v in vecs.items()
            if vid != q and assign[vid] in probed
        ]
        cand.sort(key=lambda t: (-t[1], t[0]))
        for rank, (vid, score) in enumerate(cand[:DEFAULT_K], 1):
            expected.append((q, vid, score, rank))

    got = [
        (r["query_id"], r["vec_id"], r["score"], r["rank"])
        for r in ivf_topk(spark, SF).collect()
    ]
    assert got == expected
