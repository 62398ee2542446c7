"""Graph extensions: connected components + degree stats on a golden
micro-graph with known structure."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pagerank_using_mapreduce_spark.operators.graph import (
    connected_components,
    degree_stats,
    undirected_edges,
)

# Two components {a,b,c} (a→b→c) and {x,y} (x→y), plus isolated z,
# a phantom target (b→ghost must not merge anything), and a duplicate
# link a→b twice (degree counts both, CC unaffected).
PAGES = [
    ("a", ["b", "b"]),
    ("b", ["c", "ghost"]),
    ("c", []),
    ("x", ["y"]),
    ("y", []),
    ("z", []),
]


@pytest.fixture(scope="module")
def pages(spark):
    return spark.createDataFrame(PAGES, "title string, links array<string>")


def test_undirected_edges_drop_phantoms_and_dups(pages):
    got = sorted(map(tuple, undirected_edges(pages).collect()))
    assert got == [
        ("a", "b"),
        ("b", "a"),
        ("b", "c"),
        ("c", "b"),
        ("x", "y"),
        ("y", "x"),
    ]


def test_connected_components_golden(pages):
    got = {r["title"]: r["component"] for r in connected_components(pages).collect()}
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x", "z": "z"}


def test_degree_stats_counts_duplicates(pages):
    got = {
        r["title"]: (r["out_degree"], r["in_degree"])
        for r in degree_stats(pages).collect()
    }
    assert got["a"] == (2, 0)  # two a→b links out, nothing in
    assert got["b"] == (2, 2)  # c+ghost out; both a→b occurrences in
    assert got["c"] == (0, 1)
    assert got["z"] == (0, 0)


def test_connected_components_until_fixpoint(pages):
    from pagerank_using_mapreduce_spark.operators.graph import (
        connected_components_until,
    )

    out = connected_components_until(pages).collect()
    got = {r["title"]: r["component"] for r in out}
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x", "z": "z"}
    iters = out[0]["iterations"]
    assert iters <= 4  # tiny graph: converged + one confirming round


def test_cc_star_golden_and_empty(pages, spark):
    from pagerank_using_mapreduce_spark.operators.graph import (
        connected_components_star,
    )

    got = {
        r["title"]: r["component"]
        for r in connected_components_star(pages).collect()
    }
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x", "z": "z"}
    # edgeless corpus: every page is its own component
    lonely = spark.createDataFrame(
        [("p", []), ("q", [])], "title string, links array<string>"
    )
    got = {
        r["title"]: r["component"]
        for r in connected_components_star(lonely).collect()
    }
    assert got == {"p": "p", "q": "q"}


def test_cc_star_long_chain_matches_hashmin(spark):
    """A 40-node path (diameter 39): hash-min needs ~39 rounds, the
    star algorithm a handful — both must land on identical labels."""
    from pagerank_using_mapreduce_spark.operators.graph import (
        connected_components_star,
        connected_components_until,
    )

    n = 40
    rows = [
        (f"n{i:02d}", [f"n{i + 1:02d}"] if i + 1 < n else [])
        for i in range(n)
    ] + [("solo", [])]
    chain = spark.createDataFrame(rows, "title string, links array<string>")
    star = {
        r["title"]: r["component"]
        for r in connected_components_star(chain).collect()
    }
    hashmin = {
        r["title"]: r["component"]
        for r in connected_components_until(chain, max_iterations=60).collect()
    }
    assert star == hashmin
    assert star["n39"] == "n00" and star["solo"] == "solo"


def test_triangle_count_golden(spark):
    from pagerank_using_mapreduce_spark.operators.graph import triangle_count

    # K4 (4 triangles) plus a pendant node and a disconnected 4-cycle (0)
    g = spark.createDataFrame(
        [
            ("a", ["b", "c", "d"]),
            ("b", ["c", "d"]),
            ("c", ["d"]),
            ("d", ["e"]),  # pendant
            ("e", []),
            ("p", ["q"]), ("q", ["r"]), ("r", ["s"]), ("s", ["p"]),  # C4
        ],
        "title string, links array<string>",
    )
    row = triangle_count(g).first()
    assert row["n_triangles"] == 4
    # K4=6 edges + pendant 1 + C4=4
    assert row["n_edges"] == 11


def test_triangle_count_duplicate_links_not_double_counted(spark):
    from pagerank_using_mapreduce_spark.operators.graph import triangle_count

    g = spark.createDataFrame(
        [("a", ["b", "b", "c"]), ("b", ["c", "a"]), ("c", [])],
        "title string, links array<string>",
    )
    row = triangle_count(g).first()
    assert row["n_triangles"] == 1
    assert row["n_edges"] == 3


def test_hits_star_golden(spark):
    """a→b, c→b: b is the sole authority (=1), a and c split hub mass
    evenly; b has no outlinks so its hub is 0, and a/c have no inlinks
    so their authority is 0."""
    from pagerank_using_mapreduce_spark.operators.graph import hits

    pages = spark.createDataFrame(
        [("a", ["b"]), ("b", []), ("c", ["b"])],
        "title string, links array<string>",
    )
    got = {r["title"]: (r["hub"], r["authority"]) for r in hits(pages).collect()}
    assert got["b"][0] == 0.0 and got["b"][1] == pytest.approx(1.0)
    assert got["a"][0] == pytest.approx(0.5) and got["a"][1] == 0.0
    assert got["c"][0] == pytest.approx(0.5) and got["c"][1] == 0.0


def test_hits_ignores_phantom_targets(spark):
    """Links to pages that don't exist carry no authority mass and
    don't count toward hub totals (same F3 gate as the rank join)."""
    from pagerank_using_mapreduce_spark.operators.graph import hits

    pages = spark.createDataFrame(
        [("a", ["ghost", "b"]), ("b", [])],
        "title string, links array<string>",
    )
    got = {r["title"]: (r["hub"], r["authority"]) for r in hits(pages).collect()}
    assert got["a"] == (pytest.approx(1.0), 0.0)
    assert got["b"] == (0.0, pytest.approx(1.0))
    assert "ghost" not in got


def test_bfs_depths_chain_and_unreachable(spark):
    """Chain a→b→c→d with an off-path x→y: depths from {a} are
    0,1,2,3 and x/y are absent (unreachable)."""
    from pagerank_using_mapreduce_spark.operators.graph import bfs_depths

    pages = spark.createDataFrame(
        [("a", ["b"]), ("b", ["c"]), ("c", ["d"]), ("d", []),
         ("x", ["y"]), ("y", [])],
        "title string, links array<string>",
    )
    got = {r["title"]: r["depth"] for r in bfs_depths(pages, ["a"]).collect()}
    assert got == {"a": 0, "b": 1, "c": 2, "d": 3}


def test_bfs_depths_multi_source_min(spark):
    """Two sources: every node takes the MIN hop count over sources;
    a diamond reached from both ends keeps the closer depth."""
    from pagerank_using_mapreduce_spark.operators.graph import bfs_depths

    pages = spark.createDataFrame(
        [("a", ["m"]), ("m", ["z"]), ("z", []), ("q", ["z"])],
        "title string, links array<string>",
    )
    got = {r["title"]: r["depth"] for r in bfs_depths(pages, ["a", "q"]).collect()}
    assert got == {"a": 0, "q": 0, "m": 1, "z": 1}


def test_bfs_depth_capped_by_iterations(spark):
    """With iterations=2, nodes 3+ hops out are absent — the fixed-round
    contract the oracle unrolls."""
    from pagerank_using_mapreduce_spark.operators.graph import bfs_depths

    pages = spark.createDataFrame(
        [("a", ["b"]), ("b", ["c"]), ("c", ["d"]), ("d", [])],
        "title string, links array<string>",
    )
    got = {r["title"]: r["depth"]
           for r in bfs_depths(pages, ["a"], iterations=2).collect()}
    assert got == {"a": 0, "b": 1, "c": 2}


def test_kcore_peels_tails_keeps_cycle(spark):
    """Cycle a-b-c-d (all degree 2) with a pendant tail e-f: the
    2-core is exactly the cycle; the tail peels off in two rounds."""
    from pagerank_using_mapreduce_spark.operators.graph import kcore_survivors

    pages = spark.createDataFrame(
        [("a", ["b"]), ("b", ["c"]), ("c", ["d"]), ("d", ["a"]),
         ("e", ["a", "f"]), ("f", [])],
        "title string, links array<string>",
    )
    got = sorted(r["title"] for r in kcore_survivors(pages).collect())
    assert got == ["a", "b", "c", "d"]


def test_kcore_empty_when_forest(spark):
    """A tree has no 2-core: everything peels."""
    from pagerank_using_mapreduce_spark.operators.graph import kcore_survivors

    pages = spark.createDataFrame(
        [("r", ["x", "y"]), ("x", ["x1"]), ("y", []), ("x1", [])],
        "title string, links array<string>",
    )
    assert kcore_survivors(pages).count() == 0


def test_label_propagation_star_and_goldens(spark):
    """Star graph: leaves adopt the hub's label in round 1; the hub
    adopts the plurality (= any leaf label, tie -> min).  Subsequent
    rounds replay deterministically; isolated nodes keep their own
    label."""
    from pagerank_using_mapreduce_spark.operators.graph import (
        label_propagation,
    )

    # hub h linked to leaves a,b,c (undirected via symmetric closure);
    # z is isolated (no links, never a target)
    pages = spark.createDataFrame(
        [
            ("h", ["a", "b", "c"]),
            ("a", []),
            ("b", []),
            ("c", []),
            ("z", []),
        ],
        "title string, links array<string>",
    )
    got1 = {
        r["title"]: r["community"]
        for r in label_propagation(pages, rounds=1).collect()
    }
    # round 1: leaves see only h; h sees {a,b,c} each once -> min "a"
    assert got1 == {"h": "a", "a": "h", "b": "h", "c": "h", "z": "z"}
    got2 = {
        r["title"]: r["community"]
        for r in label_propagation(pages, rounds=2).collect()
    }
    # round 2: leaves see h's new label "a"; h sees {h,h,h} -> "h"
    assert got2 == {"h": "h", "a": "a", "b": "a", "c": "a", "z": "z"}


def test_sssp_weighted_min_plus(spark):
    """Weighted relaxation golden: weight(dst) = len(dst)%5+1, so
    a->bb costs 3, ->ccc costs 4, ->dddd costs 5, ->eeeee costs 1.
    The min over alternative paths wins (min-plus, not hop count)."""
    from pagerank_using_mapreduce_spark.operators.graph import sssp_dists

    pages = spark.createDataFrame(
        [
            ("a", ["bb", "ccc", "eeeee"]),
            ("bb", ["dddd"]),
            ("ccc", ["dddd"]),
            ("eeeee", ["ccc"]),
            ("dddd", []),
        ],
        "title string, links array<string>",
    )
    got = {r["title"]: r["dist"] for r in sssp_dists(pages, ["a"]).collect()}
    # ccc: direct 4 beats eeeee-route 1+4=5; dddd: via bb 3+5=8 beats 4+5=9
    assert got == {"a": 0, "bb": 3, "ccc": 4, "eeeee": 1, "dddd": 8}


def test_reciprocity_golden(spark):
    """a<->b mutual, a->c one-way, self-loop ignored: 2 of 3 edges
    reciprocal (the q_a9_reciprocity edge/semi-join construction on a
    hand-built pages graph)."""
    from pagerank_using_mapreduce_spark.operators.pagerank import edges
    from pyspark.sql import functions as F

    pages = spark.createDataFrame(
        [("a", ["b", "c", "a"]), ("b", ["a"]), ("c", [])],
        "title string, links array<string>",
    )
    titles = pages.select("title")
    de = (
        edges(pages)
        .join(titles.withColumnRenamed("title", "dst"), "dst")
        .select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    recip = de.alias("x").join(
        de.alias("y"),
        (F.col("x.src") == F.col("y.dst")) & (F.col("x.dst") == F.col("y.src")),
        "left_semi",
    )
    assert de.count() == 3
    assert recip.count() == 2


def test_bfs_frontier_matches_dense_and_goes_deeper(spark):
    """Frontier-delta BFS equals the dense min-merge form at the same
    hop budget, and — unlike the fixed-k form — runs to exhaustion on
    a chain deeper than the budget."""
    from pagerank_using_mapreduce_spark.operators.graph import (
        bfs_depths,
        bfs_depths_frontier,
    )

    chain = spark.createDataFrame(
        [(f"n{i:02d}", [f"n{i + 1:02d}"]) for i in range(12)] + [("n12", [])],
        "title string, links array<string>",
    )
    dense = {r["title"]: r["depth"]
             for r in bfs_depths(chain, ["n00"], iterations=5).collect()}
    frontier5 = {r["title"]: r["depth"]
                 for r in bfs_depths_frontier(chain, ["n00"], max_iterations=5).collect()}
    assert frontier5 == dense  # identical at the same budget
    full = {r["title"]: r["depth"]
            for r in bfs_depths_frontier(chain, ["n00"]).collect()}
    assert full == {f"n{i:02d}": i for i in range(13)}  # exhausts the chain


def test_kcore_until_peels_deeper_than_fixed_budget(spark):
    """A long tail hanging off a triangle: fixed 6-round peeling
    leaves part of the tail, the convergent variant strips it all the
    way down to the triangle (the true 2-core)."""
    from pagerank_using_mapreduce_spark.operators.graph import (
        kcore_survivors,
        kcore_until,
    )

    # triangle a-b-c plus a 10-node path hanging off c
    rows = [("a", ["b", "c"]), ("b", ["c"])]
    rows.append(("c", ["t0"]))
    for i in range(10):
        rows.append((f"t{i}", [f"t{i + 1}"] if i < 9 else []))
    g = spark.createDataFrame(rows, "title string, links array<string>")
    fixed = {r["title"] for r in kcore_survivors(g, k=2, rounds=6).collect()}
    assert any(t.startswith("t") for t in fixed)  # budget too small
    conv = {r["title"] for r in kcore_until(g, k=2).collect()}
    assert conv == {"a", "b", "c"}  # the true 2-core


def test_landmark_closeness_chain_golden(spark):
    """Chain a->b->c with landmarks {a, b}: b is seen only from a
    (depth 1, closeness 1.0); c from both (1/a at 2, 1/b at 1 ->
    2/3); a is unreached (no self rows) and absent."""
    from pagerank_using_mapreduce_spark.operators.graph import (
        bfs_depths_labeled,
        landmark_closeness,
    )

    chain = spark.createDataFrame(
        [("a", ["b"]), ("b", ["c"]), ("c", [])],
        "title string, links array<string>",
    )
    d = {
        (r["seed"], r["title"]): r["depth"]
        for r in bfs_depths_labeled(chain, ["a", "b"], iterations=4).collect()
    }
    assert d == {
        ("a", "a"): 0, ("b", "b"): 0,
        ("a", "b"): 1, ("a", "c"): 2, ("b", "c"): 1,
    }, d
    got = {
        r["title"]: (r["n_seen"], r["total_depth"], r["closeness_e6"])
        for r in landmark_closeness(chain, ["a", "b"], iterations=4).collect()
    }
    assert got == {"b": (1, 1, 1_000_000), "c": (2, 3, 666_667)}, got
