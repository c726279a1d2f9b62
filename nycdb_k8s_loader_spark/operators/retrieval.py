"""Sparse text retrieval over a document corpus — BM25 ranking.

The retrieval member of the training-data pipeline pack: given a
handful of query documents, rank the corpus by BM25 — the shape used
for benchmark-decontamination search (find training docs that "answer"
an eval query) and for nearest-neighbour corpus audits where no
embeddings exist. Complements the dense-vector ANN family
(operators/similarity.py s01-s10) with the lexical side.

100 TB shape: the corpus is reduced once to a (doc, term, tf) posting
table plus per-term document frequencies and per-doc lengths — three
map-side-combinable aggregations over one tokenize pass, no text
bodies past the term strings. Queries reach candidates through ONE
equi-join on the term column (the inverted-index probe: only postings
of query terms are touched — with a term-partitioned posting table the
scan prunes to |query vocabulary| partitions), never a doc × doc
product. Corpus-level constants (N, avg doc length) ride along as a
broadcast one-row frame, not a driver collect.

Determinism for the DuckDB oracle twin: the usual BM25 idf is
``ln((N-df+.5)/(df+.5))`` — a transcendental whose last ulp differs
across libm implementations. Like t11's tf/df choice, this uses the
log-free rational idf ``(N-df+.5)/(df+.5)`` (same ordering: strictly
decreasing in df) so every per-term score is a chain of exactly-
rounded IEEE ops both engines agree on bit-for-bit. The per-doc
reduction quantizes each (bit-identical) per-term score to a
fixed-point integer — ``floor(s * 1e6)`` — and SUMS the integers:
integer addition is associative/commutative, so the aggregate is
order-independent by construction, map-side combinable, and stays
inside whole-stage codegen. The first cut instead kept float order
identical via collect_list + array_sort + an F.aggregate fold; at
150k docs that plan burned 2,690 s of executor CPU and 187 s of GC
in the two agg stages (struct rows + interpreted higher-order
lambda, ~29x wall on x3 data) — the fixed-point SUM removes the
struct materialization and the interpreted fold outright.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def bm25_topk(
    df: DataFrame,
    query_ids: list[int],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Rank the corpus against each query document by BM25.

    Returns ``(query_id, doc_id, rank, score)`` — per query the top
    ``k`` other documents by BM25 score, ties broken by ascending doc
    id. Query terms are the query document's DISTINCT words (standard
    practice: query-side tf is not weighted). ``score`` is the
    fixed-point sum of per-term scores at 1e-6 resolution
    (``sum(floor(s * 1e6)) / 1e6`` — see module docstring): exact,
    order-independent, and identical in both engines because every
    per-term ``s`` is bit-identical.
    """
    words = df.select(
        F.col(id_col),
        F.filter(
            F.split(F.lower(F.trim(F.col(text_col))), " "),
            lambda w: w != "",
        ).alias("__ws"),
    )
    toks = words.select(id_col, F.explode("__ws").alias("term"))
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dl = words.select(F.col(id_col), F.size("__ws").alias("dl"))
    # corpus constants as a broadcast 1-row frame (no driver collect);
    # avgdl = exact-long sum / exact-long count, ONE double division —
    # Spark's `/` and DuckDB's `/` are both IEEE float division here
    totals = dl.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))

    scored = (
        tf.join(dfreq.hint("shuffle_hash"), "term")
        .join(dl.hint("shuffle_hash"), id_col)
        .crossJoin(F.broadcast(totals))
        .select(
            F.col(id_col),
            "term",
            (
                ((F.col("n_docs") - F.col("df") + F.lit(0.5))
                 / (F.col("df") + F.lit(0.5)))
                * (F.col("tf") * F.lit(k1 + 1))
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (
                        F.lit(1 - b)
                        + F.lit(b)
                        * (
                            F.col("dl")
                            / (F.col("sum_dl") / F.col("n_docs"))
                        )
                    )
                )
            ).alias("s"),
        )
    )

    qterms = tf.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), "term"
    )
    # fixed-point reduction: floor(s * 1e6) is the same BIGINT in both
    # engines (s is bit-identical), and integer SUM is associative —
    # Spark partial-aggregates it map-side in the join stage, so the
    # (query, doc) shuffle carries one long per surviving pair instead
    # of a struct per matched term. At 100 TB headroom: |s| stays
    # below ~2N (rational idf), so the scaled sum fits a long up to
    # ~1e10 docs x 1e2 query terms.
    pair_scores = (
        qterms.hint("shuffle_hash").join(scored, "term")
        .filter(F.col(id_col) != F.col("query_id"))
        .groupBy("query_id", F.col(id_col))
        .agg(F.sum(F.floor(F.col("s") * F.lit(1e6))).alias("__fx"))
        .select(
            "query_id",
            F.col(id_col),
            (F.col("__fx") / F.lit(1e6)).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        pair_scores.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "rank", "score")
    )
