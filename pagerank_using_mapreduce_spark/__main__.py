"""CLI entry point — the reference's run surface, reshaped.

The reference runs as two hadoop-jar invocations
(README.md:37-46):

    hadoop jar PageRank.jar  org...PageRankAlgorithm  <in> <out>
    hadoop jar InvertedIndex.jar org...InvertedIndex  <in> <out>

Here the same two pipelines are subcommands over text dumps
(one page per line, the S1 boundary):

    python -m pagerank_using_mapreduce_spark pagerank <in_dir> <out_dir>
    python -m pagerank_using_mapreduce_spark index    <in_dir> <out_dir>

``pagerank`` writes ``<out>/ranking`` (``title \\t rank`` text lines,
globally descending — the reference's ``_sortedOutput``) and
``<out>/pages`` (the final ``##``-encoded rank records, its Job{i}
format).  ``index`` writes ``<out>/postings`` (``word \\t id1,id2``).
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="pagerank_using_mapreduce_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    pr = sub.add_parser("pagerank", help="13-job reference pipeline, one program")
    pr.add_argument("in_dir")
    pr.add_argument("out_dir")
    pr.add_argument("--iterations", type=int, default=10)
    pr.add_argument("--damping", type=float, default=0.85)

    ix = sub.add_parser("index", help="inverted word->doc index")
    ix.add_argument("in_dir")
    ix.add_argument("out_dir")

    q = sub.add_parser("query", help="run a registered driver query by name")
    q.add_argument("name", nargs="?", help="query name (omit to list all)")
    q.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    q.add_argument("--limit", type=int, default=20)

    for s in (pr, ix, q):
        s.add_argument("--cpus", type=int, default=None)

    args = p.parse_args(argv)

    if args.cmd == "query" and args.name is None:
        from .plans.registry import QUERIES

        for name in QUERIES:
            print(name)
        return 0

    from .session import get_spark

    spark = get_spark(app_name=f"cli-{args.cmd}", cpus=args.cpus)
    try:
        if args.cmd == "pagerank":
            from .operators.pagerank import pagerank, parse_corpus
            from .sources.textio import (
                read_corpus_text,
                write_rank_records_text,
                write_ranking_text,
            )

            corpus = read_corpus_text(spark, args.in_dir)
            pages = parse_corpus(corpus)
            ranks = pagerank(
                pages, iterations=args.iterations, damping=args.damping
            )
            final = pages.join(ranks, "title").select("title", "rank", "links")
            write_rank_records_text(final, f"{args.out_dir}/pages")
            write_ranking_text(ranks, f"{args.out_dir}/ranking")
            print(f"pagerank: {ranks.count()} pages -> {args.out_dir}")
        elif args.cmd == "index":
            from .operators.inverted_index import inverted_index_wiki
            from .sources.textio import read_corpus_text, write_postings_text

            corpus = read_corpus_text(spark, args.in_dir)
            postings = inverted_index_wiki(corpus)
            write_postings_text(postings, f"{args.out_dir}/postings")
            print(f"index: {postings.count()} words -> {args.out_dir}")
        else:
            from .plans.registry import QUERIES

            if args.name not in QUERIES:
                print(f"unknown query {args.name!r}; run with no name to list")
                return 2
            QUERIES[args.name](spark, args.sf_dir).show(
                args.limit, truncate=False
            )
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
