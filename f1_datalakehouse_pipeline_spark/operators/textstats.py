"""Repetition-based document quality statistics (Gopher-rule family).

Pre-training corpora are filtered on intra-document repetition: pages that
are mostly one phrase repeated (boilerplate, keyword spam, scraper loops)
poison a training mix even when their token counts and punctuation ratios
look sane. The published heuristics (Rae et al. 2021, "Scaling Language
Models: ... Gopher", appendix A1.1; reused by C4/RefinedWeb/Dolma) threshold
on duplicate-line / duplicate-n-gram mass per document. This module computes
the token-level members of that family as ONE narrow aggregation —
complementing functions/text.py's per-row quality ratios (which are pure
projections) with the stats that genuinely need a grouped count.

Scale shape: the only shuffle keys are (doc_id, bigram) then (doc_id) —
partition-parallel in the number of documents, never corpus-global. The
duplicate-token fraction is a pure projection (array_distinct on the token
array), zero shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from f1_datalakehouse_pipeline_spark.functions.text import tokens


def repetition_stats(df: DataFrame, id_col: str, content_col: str) -> DataFrame:
    """Per-document repetition profile:

    - ``n_tokens``: whitespace token count
    - ``dup_token_fraction``: 1 − |distinct tokens| / |tokens| (0.0 for
      empty docs) — the token-level analogue of Gopher's duplicate-line
      fraction for single-line corpora
    - ``top_bigram``: the most frequent token bigram (ties → lexicographic
      min, deterministic)
    - ``top_bigram_count`` / ``top_bigram_fraction``: its occurrence count
      and share of all bigram slots — Gopher's "top 2-gram character
      fraction" in token form; near-1.0 means the document is one phrase
      stamped repeatedly

    The bigram array is built with zip_with over two 1-off slices (pure
    projection); counting is explode → groupBy(doc, bigram) → groupBy(doc),
    both map-side-combinable. Docs with <2 tokens have no bigrams and report
    count 0 / fraction 0.0 via the left join.
    """
    toks = tokens(F.col(content_col))
    base = df.select(
        F.col(id_col),
        toks.alias("toks"),
    ).select(
        id_col,
        F.size("toks").alias("n_tokens"),
        F.when(
            F.size("toks") > 0,
            F.lit(1.0)
            - F.size(F.array_distinct("toks")).cast("double")
            / F.size("toks").cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_token_fraction"),
        F.expr(
            "zip_with(slice(toks, 1, greatest(size(toks) - 1, 0)),"
            "         slice(toks, 2, greatest(size(toks) - 1, 0)),"
            "         (a, b) -> concat(a, ' ', b))"
        ).alias("bigrams"),
    )
    bg = base.select(id_col, F.explode("bigrams").alias("bg"))
    counts = bg.groupBy(id_col, "bg").agg(F.count(F.lit(1)).alias("cnt"))
    top = counts.groupBy(id_col).agg(
        F.min_by("bg", F.struct(-F.col("cnt"), F.col("bg"))).alias("top_bigram"),
        F.max("cnt").alias("top_bigram_count"),
        F.sum("cnt").alias("total_bigrams"),
    )
    return (
        base.drop("bigrams")
        .join(top, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            "dup_token_fraction",
            "top_bigram",
            F.coalesce("top_bigram_count", F.lit(0)).alias("top_bigram_count"),
            F.when(
                F.col("total_bigrams") > 0,
                F.col("top_bigram_count").cast("double")
                / F.col("total_bigrams").cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("top_bigram_fraction"),
        )
    )


def chunk_documents(
    df: DataFrame,
    id_col: str,
    content_col: str,
    chunk_tokens: int = 128,
    overlap_tokens: int = 32,
) -> DataFrame:
    """Split each document into overlapping token windows — the context-prep
    step before packing/tokenization when documents exceed the model's
    sequence budget (the companion of ``operators/util.pack_sequences``,
    which handles the too-SHORT side).

    Stride = chunk_tokens − overlap_tokens (must be positive). Chunk *i*
    covers tokens ``[i·stride + 1, i·stride + chunk_tokens]`` (1-based,
    clamped at the document end); every document emits at least one chunk
    (an empty doc yields one empty chunk, so no rows silently vanish from a
    corpus accounting). Output: (id, chunk_idx, chunk_text, n_chunk_tokens).

    Scale shape: tokenize → per-row index sequence → one explode. A pure
    projection pipeline — ZERO shuffles, no window, no join; 100 TB of
    documents chunk as an embarrassingly parallel map stage.
    """
    if chunk_tokens <= overlap_tokens:
        raise ValueError("chunk_tokens must exceed overlap_tokens")
    stride = chunk_tokens - overlap_tokens
    toks = tokens(F.col(content_col))
    base = df.select(F.col(id_col), toks.alias("toks")).withColumn(
        "n_chunks",
        F.expr(
            f"1 + div(greatest(size(toks) - {chunk_tokens}, 0) + {stride - 1}, {stride})"
        ).cast("int"),
    )
    chunk = F.explode(
        F.transform(
            F.sequence(F.lit(0), F.col("n_chunks") - 1),
            lambda i: F.struct(
                i.cast("int").alias("chunk_idx"),
                F.slice(F.col("toks"), i * stride + 1, chunk_tokens).alias("ctoks"),
            ),
        )
    )
    return base.select(id_col, chunk.alias("c")).select(
        id_col,
        F.col("c.chunk_idx").alias("chunk_idx"),
        F.concat_ws(" ", F.col("c.ctoks")).alias("chunk_text"),
        F.size("c.ctoks").alias("n_chunk_tokens"),
    )


def encode_token_ids_with_table(
    df: DataFrame,
    id_col: str,
    content_col: str,
    vocab: DataFrame,
    token_col: str = "token",
    tid_col: str = "token_id",
    unk_id: int = 0,
    out_col: str = "token_ids",
) -> DataFrame:
    """Vocabulary encoding against a vocabulary TABLE — the large-vocab
    companion of ``functions/text.encode_token_ids`` (whose map-literal form
    is bounded by plan-expression size).

    posexplode → broadcast left join on the token → reassemble per doc in
    position order (``array_sort`` over (pos, id) structs — a groupBy on the
    doc id, the one shuffle). Unknown tokens → ``unk_id``; docs with no
    tokens keep an empty array (posexplode_outer + the null-pos filter in
    the re-assembly). Output: the input row plus ``out_col array<int>``.

    100 TB shape: the vocab broadcasts (vocabularies are ≤ a few million
    rows — executor-memory scale, not corpus scale); the shuffle is one
    hash partition by doc id, the same key downstream shard assignment
    uses. No UDF anywhere.
    """
    toks = df.select(
        F.col(id_col),
        F.posexplode_outer(tokens(F.col(content_col))).alias("__pos", "__tok"),
    )
    v = vocab.select(
        F.col(token_col).alias("__tok"), F.col(tid_col).cast("int").alias("__tid")
    )
    joined = toks.join(F.broadcast(v), "__tok", "left").select(
        id_col,
        "__pos",
        F.coalesce(F.col("__tid"), F.lit(int(unk_id))).alias("__tid"),
    )
    ids = joined.groupBy(id_col).agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    # null pos = the empty-doc marker row from posexplode_outer
                    F.when(
                        F.col("__pos").isNotNull(),
                        F.struct(F.col("__pos"), F.col("__tid")),
                    )
                )
            ),
            lambda s: s["__tid"],
        ).alias(out_col)
    )
    return df.join(ids, id_col, "left").withColumn(
        out_col, F.coalesce(F.col(out_col), F.array().cast("array<int>"))
    )
