"""Text-analysis expression library for training-data pipelines.

All functions return native Column expressions (JVM-side, codegen-friendly).
The portable hash is md5-prefix-as-int so the SAME value is computable in any
engine (DuckDB oracle: ``('0x' || substr(md5(x),1,12))::BIGINT``) — this is
what makes MinHash signatures exactly reproducible cross-engine.

Scale notes: everything here is a per-row projection — embarrassingly
parallel, no shuffle, safe at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Odd multipliers < 2^15 for the (a*h + b) mod p MinHash family; h < 2^48 so
# a*h < 2^63 never overflows a signed 64-bit long.
MINHASH_A = (3229, 4391, 5477, 6581, 7723, 8837, 9949, 11057,
             12203, 13309, 14423, 15527, 16649, 17761, 18869, 19973)
MINHASH_B = (711, 1823, 2939, 4051, 5167, 6277, 7393, 8501,
             9619, 10729, 11839, 12953, 14071, 15187, 16301, 17419)
MINHASH_P = (1 << 61) - 1  # Mersenne prime


def portable_hash48(col: Column) -> Column:
    """First 48 bits of md5 as a non-negative BIGINT — identical in DuckDB."""
    return F.conv(F.substring(F.md5(col), 1, 12), 16, 10).cast("long")


def tokens(col: Column) -> Column:
    """Whitespace tokenization with empty-token hygiene."""
    return F.filter(F.split(F.trim(col), r"\s+"), lambda t: t != "")


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column) -> Column:
    """A BPE-flavored upper bound: runs of letters, digits, or single
    punctuation marks each count as one token."""
    return F.size(F.regexp_extract_all(col, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0))


def punct_ratio(col: Column) -> Column:
    n = F.length(col)
    p = F.size(F.regexp_extract_all(col, F.lit(r"[.,;:!?'\"()\[\]{}-]"), 0))
    return F.when(n > 0, p.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def stopword_ratio(col: Column, stopwords: tuple[str, ...]) -> Column:
    toks = tokens(F.lower(col))
    sw = F.array(*[F.lit(w) for w in stopwords])
    n = F.size(toks)
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return F.when(n > 0, hits.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def quality_score(col: Column, stopwords: tuple[str, ...] = ("the", "a", "of", "and", "to")) -> Column:
    """Composite [0,1] quality heuristic: length band + low punctuation +
    reasonable stopword density (the classic C4/Gopher-style filters)."""
    n_tok = token_count(col).cast("double")
    len_ok = F.when((n_tok >= 5) & (n_tok <= 100000), F.lit(1.0)).otherwise(F.lit(0.0))
    punct_ok = F.when(punct_ratio(col) < 0.3, F.lit(1.0)).otherwise(F.lit(0.0))
    sw = stopword_ratio(col, stopwords)
    sw_ok = F.when((sw > 0.0) & (sw < 0.8), F.lit(1.0)).otherwise(F.lit(0.0))
    return (len_ok + punct_ok + sw_ok) / F.lit(3.0)


def word_shingles(col_name: str, k: int = 3) -> Column:
    """Distinct k-word shingles of a document (the MinHash/Jaccard unit).

    Takes a column NAME so the expression can reference it inside SQL lambdas.
    The token array is bound to a lambda variable (``transform(array(toks),
    ts -> ...)``) so tokenization runs ONCE per row — inlining it in the inner
    lambda would re-split the text per shingle position (O(tokens²) per doc,
    measured 10x slower at sf0.1), and a separate projection can be undone by
    CollapseProject.
    """
    toks = f"filter(split(trim({col_name}), '\\\\s+'), t -> t != '')"
    return F.array_distinct(
        F.expr(
            f"element_at(transform(array({toks}), ts -> "
            f"transform(sequence(1, greatest(size(ts) - {k - 1}, 1)),"
            f" i -> array_join(slice(ts, i, {k}), ' '))), 1)"
        )
    )


def minhash_term(shingle_hash: Column, i: int) -> Column:
    """The i-th MinHash term for one shingle: (a_i * h + b_i) mod p."""
    return (F.lit(MINHASH_A[i]) * shingle_hash + F.lit(MINHASH_B[i])) % F.lit(MINHASH_P)


# Combining multipliers for arithmetic k-gram hashes (shingle hash from token
# hashes without materializing shingle strings). Small odd constants whose
# TOTAL (plus the implicit trailing weight 1) stays < 2^15, so the whole
# weighted sum of 48-bit token hashes stays < 2^63 for any supported k.
# The first two are frozen: changing them would change every k=3 shingle
# hash the dedup oracles are locked to.
SHINGLE_C = (12289, 23, 4093, 2039, 1021, 509, 251)


def shingle_hashes_from_tokens(col_name: str, k: int = 3) -> Column:
    """Distinct k-gram shingle hashes computed ARITHMETICALLY from per-token
    portable hashes: h(i) = (c1*h_i + c2*h_{i+1} + ... + h_{i+k-1}) mod 2^61-1.

    One md5 per TOKEN (not per shingle) and zero string concatenation — the
    hot-path form of word_shingles+portable_hash48 (measured ~35% faster at
    sf0.1). Exactly reproducible in SQL with the same constants. Supports
    k up to ``len(SHINGLE_C) + 1`` (k=8 covers the contamination-check
    window).
    """
    if k - 1 > len(SHINGLE_C):
        raise ValueError(
            f"shingle k={k} needs {k - 1} combining constants; "
            f"SHINGLE_C has {len(SHINGLE_C)}"
        )
    toks = f"filter(split(trim({col_name}), '\\\\s+'), tk0 -> tk0 != '')"
    th = f"transform({toks}, tk1 -> cast(conv(substring(md5(tk1), 1, 12), 16, 10) as bigint))"
    weights = " + ".join(
        (f"{SHINGLE_C[j]}L * element_at(hs, i + {j})" if j < k - 1 else f"element_at(hs, i + {j})")
        for j in range(k)
    )
    # bind the token-hash array to a lambda variable so hashing runs once per
    # row (lambda variable names are all distinct — nested same-named lambda
    # parameters shadow each other into nulls)
    # final reduction to 48 bits keeps downstream MinHash terms (a_i * h)
    # inside int64 — same contract as portable_hash48
    return F.expr(
        f"array_distinct(element_at(transform(array({th}), hs -> "
        f"transform(sequence(1, greatest(size(hs) - {k - 1}, 1)), "
        f"i -> (({weights}) % {MINHASH_P}L) % {1 << 48}L)), 1))"
    )


def linear_model_score(
    col: Column,
    weights_milli: tuple[int, ...],
    bias_milli: int = 0,
) -> Column:
    """fastText-style linear text classifier applied as a NATIVE columnar
    expression — the model-based successor to the heuristic quality_score
    (the shape of the CCNet / Dolma quality filters): each token hashes into
    one of ``len(weights_milli)`` feature buckets, the bucket weights sum,
    and the score is squashed to (-1, 1).

    Built for exact cross-engine verification and 100 TB scale:

    - weights are INTEGER milli-units, so the feature sum is exact int64
      arithmetic — no float summation order anywhere (the only float op is
      the final division and rational squash, both order-free);
    - the squash is x/(1000 + |x|) (rational, pure arithmetic) instead of a
      sigmoid — ``exp`` is libm-dependent and not bit-identical between the
      JVM and DuckDB;
    - the weight vector is baked into the expression as a SINGLE array
      Literal node (``F.lit(list)``, not an ``F.array`` of per-element
      literal expressions — the per-element form builds an O(dim) expression
      tree that strains Catalyst analysis at hashed-feature dims): scoring
      is a pure map stage, no shuffle, no UDF, no model server. dim=2^16 is
      exercised by test; dims toward 2^20 cost plan-serialization size
      linearly and are untested here — ship weights that large via a
      broadcast join against a (bucket, weight) table instead.

    Returns DOUBLE in (-1, 1); rank/filter on it exactly as on quality_score.
    """
    dim = len(weights_milli)
    w = F.lit([int(v) for v in weights_milli]).cast("array<bigint>")
    toks = tokens(col)
    total = F.aggregate(
        toks,
        F.lit(int(bias_milli)).cast("long"),
        lambda acc, t: acc
        + F.element_at(w, (portable_hash48(t) % dim + 1).cast("int")),
    )
    return total.cast("double") / (F.lit(1000.0) + F.abs(total.cast("double")))


def encode_token_ids(col: Column, vocab: dict[str, int], unk_id: int = 0) -> Column:
    """Whitespace tokens → vocabulary ids as a PURE map-stage expression: a
    flat ``create_map`` literal lookup per token (same depth-1 construction
    rationale as operators/mixture._lookup_expr), unknown tokens → ``unk_id``.
    Returns ``array<int>`` preserving token order — the id encoding a
    training shard ships instead of raw text. No UDF, no shuffle, no model
    server; for vocabularies too large for one plan expression use
    :func:`encode_token_ids_with_table` (broadcast join, one shuffle)."""
    pairs: list = []
    for tok, i in vocab.items():
        pairs += [F.lit(tok), F.lit(int(i))]
    m = F.create_map(*pairs)
    return F.transform(
        tokens(col),
        lambda t: F.coalesce(F.try_element_at(m, t), F.lit(int(unk_id))).cast("int"),
    )


def decode_token_ids(col: Column, vocab: dict[str, int], unk_token: str = "<unk>") -> Column:
    """Inverse of :func:`encode_token_ids`: ``array<int>`` → ``array<string>``
    via the inverted vocabulary (ids must be unique; checked). Tokens that
    encoded to ``unk_id`` decode to ``unk_token`` — round-trip is exact for
    in-vocabulary text (tested)."""
    inv: dict[int, str] = {}
    for tok, i in vocab.items():
        if int(i) in inv:
            raise ValueError(f"duplicate id {i} in vocab (for {inv[int(i)]!r} and {tok!r})")
        inv[int(i)] = tok
    pairs: list = []
    for i, tok in inv.items():
        pairs += [F.lit(int(i)), F.lit(tok)]
    m = F.create_map(*pairs)
    return F.transform(
        col, lambda i: F.coalesce(F.try_element_at(m, i.cast("int")), F.lit(unk_token))
    )


def html_strip(col: Column) -> Column:
    """Strip HTML markup to clean text: drop tags, decode the common
    entities, collapse ASCII whitespace, trim. Pure native projection —
    scan-speed inside whole-stage codegen. '&amp;' decodes LAST: a source
    containing the escaped entity '&amp;lt;' means the visible characters
    '&lt;', and amp-first order would double-decode it into '<'. Regexes
    stay inside the dialect Java (Spark) and RE2 (DuckDB) share, so the
    registry oracle reproduces this exactly."""
    out = F.regexp_replace(col, "<[^>]*>", " ")
    for ent, ch in (
        ("&lt;", "<"),
        ("&gt;", ">"),
        ('&quot;', '"'),
        ("&nbsp;", " "),
        ("&amp;", "&"),
    ):
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(out, "[ \t\n]+", " "))


def html_tag_count(col: Column) -> Column:
    """Number of HTML tags in the raw markup (size of the tag match set)."""
    return F.size(F.regexp_extract_all(col, F.lit("<[^>]*>"), 0)).cast("long")
