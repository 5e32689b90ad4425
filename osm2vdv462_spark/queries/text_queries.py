"""Training-data pipeline operators over `documents` / `embeddings`:
dedup, text quality, similarity search (task brief: first-class at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from . import register, register_extra


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


@register_extra(
    "dedup_exact",
    """
    SELECT min(doc_id) AS rep_doc_id, count(*) AS n_copies
    FROM documents GROUP BY md5(text) HAVING count(*) >= 1
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via content-hash groupBy: keep the min doc_id as the
    canonical representative. Hash-first so the shuffle key is 16 bytes,
    not the document text (the 100 TB-friendly form)."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.groupBy(F.md5(F.col("text").cast("binary")).alias("h"))
        .agg(F.min("doc_id").alias("rep_doc_id"), F.count("*").alias("n_copies"))
        .select("rep_doc_id", "n_copies")
    )


@register_extra(
    "token_stats",
    """
    WITH t AS (
      SELECT doc_id, text,
             list_filter(string_split_regex(text, ''), x -> x <> '') AS cs
      FROM documents
    ),
    u AS (
      SELECT doc_id, text, cs,
             CAST(len(cs) AS DOUBLE) AS tot,
             list_sort(list_distinct(cs)) AS dist
      FROM t
    )
    SELECT doc_id,
           CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
                AS BIGINT) AS n_tokens,
           CAST(len(regexp_extract_all(text,
             '''s|''t|''re|''ve|''m|''ll|''d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+'))
                AS BIGINT) AS n_tokens_bpe,
           CAST(length(text) AS BIGINT) AS n_chars_exact,
           CAST(round(-list_sum(list_transform(dist,
                c -> (len(list_filter(cs, x -> x = c)) / tot)
                     * ln(len(list_filter(cs, x -> x = c)) / tot))), 4)
                AS DOUBLE) AS entropy_nats
    FROM u
    """,
)
def token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (whitespace tokenizer AND a GPT-2-style BPE
    pretokenizer regex — the task brief's two counting modes) + length +
    character-level Shannon entropy (gibberish / compressibility
    signal) — text-analysis primitives for quality filtering, all
    per-row JVM expressions with NO shuffle (the 10^12-doc cost shape;
    char_entropy in the extra tier is the shuffle formulation of the
    same entropy, oracle-checked in pytest). Entropy sums over SORTED
    distinct chars so the float addition order is pinned across
    engines; the pretokenizer pattern stays in the subset where Java
    regex and RE2 agree (verified match-count-exact on the corpus)."""
    d = _t(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    base = d.select(
        "doc_id",
        "text",
        F.filter(F.split("text", ""), lambda c: c != "").alias("cs"),
    ).select(
        "doc_id",
        "text",
        "cs",
        F.size("cs").cast("double").alias("tot"),
        F.array_sort(F.array_distinct("cs")).alias("dist"),
    )
    n_c = lambda c: F.size(F.filter(F.col("cs"), lambda x: x == c))  # noqa: E731
    ent = -F.aggregate(
        F.col("dist"),
        F.lit(0.0),
        lambda acc, c: acc + (n_c(c) / F.col("tot")) * F.log(n_c(c) / F.col("tot")),
    )
    bpe_pat = (
        r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"
    )
    return base.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.regexp_count("text", F.lit(bpe_pat)).cast("long").alias("n_tokens_bpe"),
        F.length("text").cast("long").alias("n_chars_exact"),
        F.round(ent, 4).alias("entropy_nats"),
    )


@register_extra(
    "quality_score",
    """
    SELECT doc_id, lang,
           CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
                AS BIGINT) AS n_tokens,
           CAST(len(list_filter(string_split(text, ' '), x -> x = 'the'))
                AS BIGINT) AS n_stop,
           (length(text) >= 100 AND length(text) <= 20000) AS len_ok
    FROM documents
    """,
)
def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: token count, stopword hits, length gate — the
    components a Gopher/C4-style filter combines."""
    d = _t(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    stops = F.filter(F.split("text", " "), lambda x: x == "the")
    return d.select(
        "doc_id",
        "lang",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(stops).cast("long").alias("n_stop"),
        ((F.length("text") >= 100) & (F.length("text") <= 20000)).alias("len_ok"),
    )


@register(
    "quality_filter",
    """
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), x -> x <> '') AS toks,
             length(text) AS n_chars
      FROM documents
    ),
    s AS (
      SELECT doc_id, n_chars,
             len(toks) AS n_tok,
             len(list_filter(toks, x -> x = 'the')) AS n_stop,
             greatest(len(toks) - 2, 0) AS n3,
             len(list_distinct(
               [toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]
                FOR i IN range(greatest(len(toks) - 2, 0))]
             )) AS n3d
      FROM t
    )
    SELECT doc_id,
           (n_chars BETWEEN 100 AND 20000) AS len_ok,
           (n_tok >= 10) AS tok_ok,
           (n_stop * 100 >= n_tok) AS stop_ok,
           (n3 = 0 OR (n3 - n3d) * 5 <= n3) AS rep_ok,
           ((n_chars BETWEEN 100 AND 20000) AND n_tok >= 10
            AND n_stop * 100 >= n_tok
            AND (n3 = 0 OR (n3 - n3d) * 5 <= n3)) AS keep
    FROM s ORDER BY doc_id
    """,
)
def quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composite Gopher/C4-style keep/drop decision a training
    pipeline actually ships: length gate AND >=10 tokens AND stopword
    rate >= 1% AND duplicate-trigram fraction <= 20%. Every predicate is
    INTEGER arithmetic (n_stop*100 >= n_tok, (n3-n3d)*5 <= n3) — no
    float ratios to disagree across engines — and the whole thing is
    one codegen projection per document, no shuffle."""
    d = _t(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    base = d.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        toks.alias("toks"),
        F.size(toks).alias("n_tok"),
        F.size(F.filter(toks, lambda x: x == "the")).alias("n_stop"),
    )
    tri = F.when(
        F.col("n_tok") >= 3,
        F.transform(
            F.sequence(F.lit(0), F.col("n_tok") - 3),
            lambda i: F.concat_ws(
                " ",
                F.element_at("toks", i + 1),
                F.element_at("toks", i + 2),
                F.element_at("toks", i + 3),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    s = base.select(
        "doc_id",
        "n_chars",
        "n_tok",
        "n_stop",
        F.greatest(F.col("n_tok") - 2, F.lit(0)).alias("n3"),
        F.size(F.array_distinct(tri)).alias("n3d"),
    )
    len_ok = (F.col("n_chars") >= 100) & (F.col("n_chars") <= 20000)
    tok_ok = F.col("n_tok") >= 10
    stop_ok = F.col("n_stop") * 100 >= F.col("n_tok")
    rep_ok = (F.col("n3") == 0) | (
        (F.col("n3") - F.col("n3d")) * 5 <= F.col("n3")
    )
    return s.select(
        "doc_id",
        len_ok.alias("len_ok"),
        tok_ok.alias("tok_ok"),
        stop_ok.alias("stop_ok"),
        rep_ok.alias("rep_ok"),
        (len_ok & tok_ok & stop_ok & rep_ok).alias("keep"),
    ).orderBy("doc_id")


@register(
    "text_cleaning",
    """
    WITH c AS (
      SELECT doc_id,
             trim(regexp_replace(
               regexp_replace(text, '<[^>]*>', ' ', 'g'),
               '[ \\t]+', ' ', 'g')) AS cleaned
      FROM documents
    )
    SELECT doc_id, cleaned,
           CAST(length(cleaned) AS BIGINT) AS n_chars_clean
    FROM c ORDER BY doc_id
    """,
)
def text_cleaning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate cleaning: strip tag-like runs, collapse horizontal
    whitespace, trim — pure Catalyst regexp_replace (JVM-side, no
    Python). The patterns stay in the character-class subset where Java
    regex and RE2 (DuckDB) agree exactly."""
    d = _t(spark, sf_dir, "documents")
    cleaned = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), "<[^>]*>", " "),
            "[ \\t]+",
            " ",
        )
    )
    return d.select(
        "doc_id",
        cleaned.alias("cleaned"),
        F.length(cleaned).cast("long").alias("n_chars_clean"),
    ).orderBy("doc_id")


@register_extra(
    "char_entropy",
    """
    WITH ch AS (
      SELECT doc_id, unnest(string_split_regex(text, '')) AS c
      FROM documents
    ),
    f AS (
      SELECT doc_id, c, count(*) AS n,
             sum(count(*)) OVER (PARTITION BY doc_id) AS tot
      FROM ch WHERE c <> '' GROUP BY doc_id, c
    )
    SELECT doc_id,
           CAST(round(-sum((n / CAST(tot AS DOUBLE))
                           * ln(n / CAST(tot AS DOUBLE))), 4)
                AS DOUBLE) AS entropy_nats
    FROM f GROUP BY doc_id ORDER BY doc_id
    """,
)
def char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-distribution Shannon entropy per document (a cheap
    gibberish/compression-quality signal): explode chars -> per-doc
    char frequencies -> -sum(p ln p). All JVM-side; one shuffle keyed
    (doc_id, char)."""
    d = _t(spark, sf_dir, "documents")
    ch = d.select(
        "doc_id", F.explode(F.split("text", "")).alias("c")
    ).filter(F.col("c") != "")
    f = ch.groupBy("doc_id", "c").agg(F.count("*").alias("n"))
    tot = f.groupBy("doc_id").agg(F.sum("n").alias("tot"))
    p = F.col("n") / F.col("tot").cast("double")
    return (
        f.join(tot, "doc_id")
        .groupBy("doc_id")
        .agg(F.round(-F.sum(p * F.log(p)), 4).alias("entropy_nats"))
        .orderBy("doc_id")
    )


@register_extra(
    "dataset_split",
    """
    WITH t AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)),
                                  1, 7))::BIGINT % 100 AS BIGINT) AS b
      FROM documents
    )
    SELECT doc_id,
           CASE WHEN b < 90 THEN 'train'
                WHEN b < 95 THEN 'val'
                ELSE 'test' END AS split
    FROM t ORDER BY doc_id
    """,
)
def dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-based train/val/test split (90/5/5): bucket =
    md5('split:'||doc_id) mod 100. Hash-based (not random) so the split
    is stable under reruns, repartitions, and incremental appends — the
    property a training pipeline actually needs. Pure Catalyst: one
    projection, no shuffle."""
    d = _t(spark, sf_dir, "documents")
    b = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(F.lit("split:"), F.col("doc_id").cast("string"))
                    .cast("binary")
                ),
                1,
                7,
            ),
            16,
            10,
        ).cast("long")
        % 100
    )
    return d.select(
        "doc_id",
        F.when(b < 90, "train").when(b < 95, "val").otherwise("test")
        .alias("split"),
    ).orderBy("doc_id")


@register_extra(
    "sequence_packing",
    """
    WITH t AS (
      SELECT doc_id, source,
             CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
                  AS BIGINT) AS n_tok
      FROM documents
    )
    SELECT doc_id, source, n_tok,
           CAST(coalesce(sum(n_tok) OVER (
                  PARTITION BY source ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                ), 0) // 1024 AS BIGINT) AS bin_id
    FROM t ORDER BY source, doc_id
    """,
)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget sequence packing (training-batch assembly): docs are
    packed contiguously into ~1024-token bins per source, bin_id =
    floor(prefix_token_sum / budget). Window is PARTITIONED by source —
    no global ordering, so the plan shuffles once on the partition key
    and scales with source cardinality (at 100 TB you'd sub-bucket big
    sources; the shape is the same)."""
    d = _t(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    t = d.select(
        "doc_id", "source", F.size(toks).cast("long").alias("n_tok")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        t.select(
            "doc_id",
            "source",
            "n_tok",
            F.coalesce(F.sum("n_tok").over(w), F.lit(0)).alias("_cum_prev"),
        )
        .select(
            "doc_id",
            "source",
            "n_tok",
            # integer `div`: exact floor division, same as DuckDB's //
            F.expr("_cum_prev div 1024").cast("long").alias("bin_id"),
        )
        .orderBy("source", "doc_id")
    )


@register_extra(
    "repetition_stats",
    """
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents
    ),
    g AS (
      SELECT doc_id,
             greatest(len(toks) - 2, 0) AS n3,
             len(list_distinct(
               [toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]
                FOR i IN range(greatest(len(toks) - 2, 0))]
             )) AS n3_distinct
      FROM t
    )
    SELECT doc_id,
           CAST(n3 AS BIGINT) AS n3,
           CAST(n3_distinct AS BIGINT) AS n3_distinct,
           CAST(CASE WHEN n3 > 0
                     THEN round(1.0 - CAST(n3_distinct AS DOUBLE) / n3, 4)
                     ELSE 0.0 END AS DOUBLE) AS dup_frac
    FROM g
    """,
)
def repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signal: fraction of duplicate word
    trigrams per document (1 - distinct/total). Entirely JVM-side
    (split / transform / array_distinct inside codegen) — no shuffle,
    no Python: the per-document cost model that holds at 10^12 docs."""
    d = _t(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    base = d.select("doc_id", toks.alias("toks")).select(
        "doc_id", F.col("toks"), F.size("toks").alias("n")
    )
    tri = F.transform(
        F.sequence(F.lit(0), F.col("n") - 3),
        lambda i: F.concat_ws(
            " ",
            F.element_at("toks", i + 1),
            F.element_at("toks", i + 2),
            F.element_at("toks", i + 3),
        ),
    )
    tri = F.when(F.col("n") >= 3, tri).otherwise(
        F.array().cast("array<string>")
    )
    out = base.select(
        "doc_id",
        F.greatest(F.col("n") - 2, F.lit(0)).cast("long").alias("n3"),
        F.size(F.array_distinct(tri)).cast("long").alias("n3_distinct"),
    )
    return out.select(
        "doc_id",
        "n3",
        "n3_distinct",
        F.when(
            F.col("n3") > 0,
            F.round(1.0 - F.col("n3_distinct") / F.col("n3"), 4),
        )
        .otherwise(0.0)
        .alias("dup_frac"),
    )


@register_extra(
    "ngram_jaccard_pairs",
    """
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(round(
             CAST(len(list_intersect(list_distinct(string_split(a.text, ' ')),
                                     list_distinct(string_split(b.text, ' '))))
                  AS DOUBLE)
             / (len(list_distinct(string_split(a.text, ' ')))
                + len(list_distinct(string_split(b.text, ' ')))
                - len(list_intersect(list_distinct(string_split(a.text, ' ')),
                                     list_distinct(string_split(b.text, ' '))))),
             4) AS DOUBLE) AS jaccard
    FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
    """,
)
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-set Jaccard similarity on candidate pairs (here: consecutive
    doc_ids as the pair generator so the oracle stays linear; in
    production the pair generator is MinHash-LSH banding — see
    minhash_lsh_dup below)."""
    d = _t(spark, sf_dir, "documents")
    a = d.select(F.col("doc_id").alias("doc_a"), F.col("text").alias("ta"))
    b = d.select(F.col("doc_id").alias("doc_b"), F.col("text").alias("tb"))
    j = a.join(b, F.col("doc_b") == F.col("doc_a") + 1)
    sa = F.array_distinct(F.split("ta", " "))
    sb = F.array_distinct(F.split("tb", " "))
    inter = F.size(F.array_intersect(sa, sb)).cast("double")
    union = F.size(sa) + F.size(sb) - F.size(F.array_intersect(sa, sb))
    return j.select(
        "doc_a", "doc_b", F.round(inter / union, 4).cast("double").alias("jaccard")
    )


@register_extra(
    "embedding_normalize",
    """
    WITH s AS (
      SELECT vec_id,
             list_sum(list_transform(embedding,
                      e -> CAST(e AS DOUBLE) * CAST(e AS DOUBLE))) AS ss,
             list_sum(list_transform(embedding[1:8],
                      e -> CAST(e AS DOUBLE) * CAST(e AS DOUBLE))) AS ss8
      FROM embeddings
    )
    SELECT vec_id,
           CAST(round(sqrt(ss), 4) AS DOUBLE) AS l2_norm,
           CAST(round(CASE WHEN ss > 0 THEN ss8 / ss ELSE 0 END, 4)
                AS DOUBLE) AS head8_energy
    FROM s ORDER BY vec_id
    """,
)
def embedding_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding normalization + matryoshka-truncation diagnostics: the
    L2 norm and the fraction of L2 energy the first 8 dims retain (what
    you check before truncating stored vectors). Elements are cast to
    DOUBLE before squaring on BOTH engines and summed in array order,
    so the floats agree bit-for-bit; all JVM-side, no shuffle."""
    e = _t(spark, sf_dir, "embeddings")
    sq = lambda v: F.aggregate(
        v,
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    s = e.select(
        "vec_id",
        sq(F.col("embedding")).alias("ss"),
        sq(F.slice("embedding", 1, 8)).alias("ss8"),
    )
    return s.select(
        "vec_id",
        F.round(F.sqrt("ss"), 4).alias("l2_norm"),
        F.round(
            F.when(F.col("ss") > 0, F.col("ss8") / F.col("ss")).otherwise(
                0.0
            ),
            4,
        ).alias("head8_energy"),
    ).orderBy("vec_id")


@register_extra(
    "embedding_top1",
    """
    WITH q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS q_emb
               FROM embeddings WHERE vec_id < 10),
    d AS (
      SELECT e.vec_id, q.q_id,
             list_dot_product(CAST(e.embedding AS DOUBLE[]), q.q_emb)
               / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                        CAST(e.embedding AS DOUBLE[])))
                  * sqrt(list_dot_product(q.q_emb, q.q_emb))) AS sim
      FROM embeddings e CROSS JOIN q
      WHERE e.vec_id <> q.q_id
    ),
    r AS (
      SELECT vec_id, q_id, sim,
             row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, q_id)
               AS rn
      FROM d
    )
    SELECT vec_id, q_id AS nearest_q,
           CAST(round(sim, 4) AS DOUBLE) AS cos_sim
    FROM r WHERE rn = 1
    """,
)
def embedding_top1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-1 similarity search: every vector vs the 10
    query vectors (vec_id < 10). JVM-side: zip_with + aggregate dot
    product — no Python in the loop. This is the exact baseline the
    LSH-bucketed ANN variant is validated against."""
    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    q = (
        e.filter(F.col("vec_id") < 10)
        .select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb"))
    )
    j = e.crossJoin(F.broadcast(q)).filter(F.col("vec_id") != F.col("q_id"))

    def dot(x, y):
        return F.aggregate(
            F.zip_with(x, y, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    sim = dot(F.col("embedding"), F.col("q_emb")) / (
        F.sqrt(dot(F.col("embedding"), F.col("embedding")))
        * F.sqrt(dot(F.col("q_emb"), F.col("q_emb")))
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("sim").desc(), F.col("q_id"))
    return (
        j.withColumn("sim", sim)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "vec_id",
            F.col("q_id").alias("nearest_q"),
            F.round("sim", 4).cast("double").alias("cos_sim"),
        )
    )


def _lang_id_oracle() -> str:
    """Marker-trigram scores recomputed relationally: non-overlapping
    substring counts via the length/replace identity, argmax with
    first-profile-wins ties, score = hits * 1000 / len (both engines
    compute the identical IEEE doubles — no rounding needed)."""
    from ..operators.textops import _PROFILES

    score_cols = []
    for lang, grams in _PROFILES.items():
        hits = " + ".join(
            f"(length(s) - length(replace(s, '{g}', ''))) // 3" for g in grams
        )
        score_cols.append(f"({hits}) * 1000.0 / n AS s_{lang}")
    langs = list(_PROFILES)
    pred = " ".join(f"WHEN s_{l} = m THEN '{l}'" for l in langs)
    return f"""
    WITH t AS (SELECT doc_id, ' ' || lower(text) || ' ' AS s,
                      greatest(length(text), 1) AS n
               FROM documents),
    sc AS (SELECT doc_id, {", ".join(score_cols)} FROM t),
    mx AS (SELECT *, greatest({", ".join("s_" + l for l in langs)}) AS m
           FROM sc)
    SELECT doc_id,
           CASE WHEN m <= 0 THEN 'und' {pred} END AS lang_pred,
           CASE WHEN m > 0 THEN m ELSE 0.0 END AS lang_score
    FROM mx ORDER BY doc_id
    """


@register_extra("lang_id_heuristic", _lang_id_oracle())
def lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram language-ID heuristic over documents; the oracle recomputes
    the trigram hit rates relationally (accuracy on real sentences is
    additionally tested in tests/test_textops.py)."""
    from ..operators.textops import lang_id_ngram

    d = _t(spark, sf_dir, "documents")
    return lang_id_ngram(d).orderBy("doc_id")


_FP_ORACLE = """
WITH base AS (SELECT doc_id, text FROM documents),
d2 AS (SELECT doc_id, lower(text) AS s FROM base
       UNION ALL
       SELECT doc_id + 200000, lower('prefix text ' || text)
       FROM base WHERE doc_id < 10),
kg AS (SELECT doc_id,
         unnest(range(1, greatest(length(s) - 24 + 2, 1))) AS i, s
       FROM d2),
kh AS (SELECT doc_id, i,
         ('0x' || substr(md5(substr(s, CAST(i AS INT), 24)), 1, 15))::BIGINT
           AS h,
         count(*) OVER (PARTITION BY doc_id) AS n_h
       FROM kg),
wins AS (SELECT doc_id, i, n_h,
           min(h) OVER (PARTITION BY doc_id ORDER BY i
                        ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS mh
         FROM kh),
fp AS (SELECT DISTINCT doc_id, mh FROM wins WHERE i <= n_h - 7
       UNION
       SELECT doc_id, min(h) AS mh FROM kh GROUP BY doc_id HAVING count(*) < 8)
SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared_fps
FROM fp a JOIN fp b ON a.mh = b.mh AND a.doc_id < b.doc_id
GROUP BY 1, 2 HAVING count(*) >= 12
ORDER BY 1, 2
"""


@register_extra("doc_fingerprint_pairs", _FP_ORACLE)
def doc_fingerprint_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprint overlap pairs (rolling-hash document
    fingerprinting); the oracle replicates k-gram hashing (md5-60),
    window minima, per-doc dedup, and the shared-print count in SQL.
    The shared-substring guarantee is tested in tests/test_textops.py."""
    from ..operators.textops import fingerprint_match_pairs

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    dups = d.filter(F.col("doc_id") < 10).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.concat(F.lit("prefix text "), F.col("text")).alias("text"),
    )
    # corpus is small-vocabulary word salad: long k-grams + a high
    # shared-print bar keep the pair set meaningful (true containment)
    return fingerprint_match_pairs(
        d.unionByName(dups), k=24, window=8, min_shared=12
    ).orderBy("id_a", "id_b")


@register(
    "streaming_windowed_counts",
    """
    SELECT CAST(epoch(time_bucket(INTERVAL '1 hour', ts)) AS BIGINT)
             AS window_start_epoch,
           event_type,
           count(*) AS n,
           CAST(round(sum(value), 4) AS DOUBLE) AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def streaming_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming watermarked tumbling-window aggregation,
    drained hermetically with Trigger.AvailableNow; the oracle is the
    exact batch semantics (time_bucket in DuckDB). Proves stream==batch
    convergence through the driver gate, not just in pytest."""
    import os
    import tempfile

    from ..streaming import events as se

    work = tempfile.mkdtemp(prefix="stream_q_")
    src = os.path.join(work, "src")
    os.makedirs(src)
    os.symlink(f"{sf_dir}/events.parquet", os.path.join(src, "part-0.parquet"))
    out = os.path.join(work, "out")
    se.run_available_now(
        spark,
        src,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
        out,
        os.path.join(work, "ckpt"),
    )
    return spark.read.parquet(out).select(
        F.col("window_start").cast("long").alias("window_start_epoch"),
        "event_type",
        "n",
        "total_value",
    )


@register_extra(
    "streaming_dedup_docs",
    """
    SELECT md5(text) AS content_md5,
           min(doc_id) AS canonical_doc_id,
           count(*) AS n_copies
    FROM documents GROUP BY 1
    """,
)
def streaming_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup (streaming/dedup.py): incremental
    content-hash dedup with a deterministic canonical representative
    (min doc_id), drained hermetically with Trigger.AvailableNow; the
    oracle is the exact batch semantics."""
    import os
    import tempfile

    from ..streaming import dedup as sd

    work = tempfile.mkdtemp(prefix="stream_dedup_")
    src = os.path.join(work, "src")
    os.makedirs(src)
    os.symlink(
        f"{sf_dir}/documents.parquet", os.path.join(src, "part-0.parquet")
    )
    out = os.path.join(work, "out")
    sd.run_available_now(spark, src, out, os.path.join(work, "ckpt"))
    return spark.read.parquet(out)


@register_extra(
    "user_sessions",
    __import__(
        "osm2vdv462_spark.streaming.sessions", fromlist=["sessionize_oracle_sql"]
    ).sessionize_oracle_sql(360),
)
def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands sessionization (6h inactivity gap) — the exact
    batch semantics of the stateful streaming sessionizer
    (streaming/sessions.py, applyInPandasWithState); stream==batch
    convergence is tested in tests/test_streaming.py."""
    from ..streaming.sessions import sessionize_batch

    e = _t(spark, sf_dir, "events")
    return sessionize_batch(e, 360).orderBy("user_id", "session_start")


_BIGRAM_LM_ORACLE = """
WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
),
base AS (SELECT doc_id, toks FROM t WHERE len(toks) >= 2),
pairs AS (
  SELECT doc_id, toks[i + 1] AS w1, toks[i + 2] AS w2
  FROM base, unnest(range(0, len(toks) - 1)) AS u(i)
),
big AS (SELECT w1, w2, count(*) AS c12 FROM pairs GROUP BY 1, 2),
uni AS (SELECT w1, count(*) AS c1 FROM pairs GROUP BY 1),
v AS (SELECT count(*) AS vocab FROM
      (SELECT w2 AS w FROM pairs UNION SELECT w1 FROM pairs)),
scored AS (
  SELECT p.doc_id,
         CAST(-log2((big.c12 + 0.5) / (uni.c1 + 0.5 * v.vocab))
              AS DECIMAL(38,18)) AS term
  FROM pairs p JOIN big USING (w1, w2) JOIN uni USING (w1) CROSS JOIN v
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(round(CAST(sum(term) AS DOUBLE) / count(*), 4) AS DOUBLE)
         AS xent
FROM scored GROUP BY doc_id ORDER BY doc_id
"""


@register("bigram_lm_score", _BIGRAM_LM_ORACLE)
def bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality scoring (operators/textops.py::
    bigram_lm_scores): self-trained bigram model, per-doc cross-entropy
    with add-0.5 smoothing; DECIMAL term sums keep the float pipeline
    order-independent across engines."""
    from ..operators.textops import bigram_lm_scores

    d = _t(spark, sf_dir, "documents")
    return bigram_lm_scores(d).orderBy("doc_id")


_PII_AUG_SQL = """
  SELECT doc_id,
    text
    || CASE WHEN doc_id % 2 = 0 THEN ' Contact user'
         || CAST(doc_id AS VARCHAR) || '@example.org now.' ELSE '' END
    || CASE WHEN doc_id % 3 = 0 THEN ' Call +1-202-555-'
         || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || '.' ELSE '' END
    || CASE WHEN doc_id % 5 = 0 THEN ' Host 10.'
         || CAST(doc_id % 256 AS VARCHAR) || '.'
         || CAST((doc_id * 7) % 256 AS VARCHAR) || '.'
         || CAST((doc_id * 13) % 256 AS VARCHAR) || ' down.' ELSE '' END
    AS full_text
  FROM documents
"""

_PII_ORACLE = rf"""
WITH aug AS ({_PII_AUG_SQL}),
red AS (
  SELECT doc_id, full_text,
    regexp_replace(full_text,
      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{{2,}}', '<EMAIL>', 'g')
      AS r1
  FROM aug
),
red2 AS (
  SELECT doc_id, full_text,
    regexp_replace(r1,
      '\+[0-9]{{1,3}}-[0-9]{{3}}-[0-9]{{3}}-[0-9]{{4}}', '<PHONE>', 'g') AS r2
  FROM red
)
SELECT doc_id,
  CAST(len(regexp_extract_all(full_text,
    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{{2,}}')) AS BIGINT)
    AS n_emails,
  CAST(len(regexp_extract_all(full_text,
    '\+[0-9]{{1,3}}-[0-9]{{3}}-[0-9]{{3}}-[0-9]{{4}}')) AS BIGINT)
    AS n_phones,
  CAST(len(regexp_extract_all(r2,
    '([0-9]{{1,3}}\.){{3}}[0-9]{{1,3}}')) AS BIGINT) AS n_ips,
  md5(regexp_replace(r2, '([0-9]{{1,3}}\.){{3}}[0-9]{{1,3}}', '<IP>', 'g'))
    AS redacted_md5
FROM red2
"""


@register("pii_redact", _PII_ORACLE)
def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub pass (operators/textops.py::pii_redact): email / phone /
    IPv4 detection counts + redacted-text md5. The synthetic corpus
    carries no natural PII, so the query deterministically augments each
    doc with PII-shaped substrings derived from doc_id — IDENTICALLY in
    Spark and the DuckDB oracle — before scrubbing; the operator under
    test is the regex redaction itself, which at 10^12 docs is one
    zero-shuffle codegen'd scan."""
    from ..operators.textops import pii_redact as _op

    d = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    aug = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                did % 2 == 0,
                F.concat(
                    F.lit(" Contact user"),
                    did.cast("string"),
                    F.lit("@example.org now."),
                ),
            ).otherwise(F.lit("")),
            F.when(
                did % 3 == 0,
                F.concat(
                    F.lit(" Call +1-202-555-"),
                    F.lpad((did % 10000).cast("string"), 4, "0"),
                    F.lit("."),
                ),
            ).otherwise(F.lit("")),
            F.when(
                did % 5 == 0,
                F.concat(
                    F.lit(" Host 10."),
                    (did % 256).cast("string"),
                    F.lit("."),
                    ((did * 7) % 256).cast("string"),
                    F.lit("."),
                    ((did * 13) % 256).cast("string"),
                    F.lit(" down."),
                ),
            ).otherwise(F.lit("")),
        ).alias("full_text"),
    )
    return _op(aug)


_CONTAMINATION_ORACLE = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents
),
grams AS (
  SELECT DISTINCT doc_id,
         md5(t[j] || ' ' || t[j+1] || ' ' || t[j+2]) AS gh
  FROM toks, unnest(range(1, len(t) - 1)) AS u(j)
  WHERE len(t) >= 3
),
bg AS (SELECT doc_id AS bench_id, gh FROM grams WHERE doc_id % 50 = 0),
dg AS (SELECT doc_id, gh FROM grams WHERE doc_id % 50 <> 0)
SELECT dg.doc_id, bg.bench_id, CAST(count(*) AS BIGINT) AS n_shared
FROM dg JOIN bg ON dg.gh = bg.gh
GROUP BY 1, 2
"""


@register("contamination_check", _CONTAMINATION_ORACLE)
def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination audit (operators/textops.py::
    ngram_contamination): every doc_id % 50 == 0 document plays the
    benchmark suite; report distinct shared word n-grams per
    (train doc, benchmark doc) pair. Join key is md5(gram) in BOTH
    engines (fixed-width candidate keys at scale; parity is exact by
    construction, not modulo collisions)."""
    from ..operators.textops import ngram_contamination

    d = _t(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 50 == 0)
    corpus = d.filter(F.col("doc_id") % 50 != 0)
    return ngram_contamination(corpus, bench, n=3)


_CHUNK_DEDUP_ORACLE = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents
),
base AS (SELECT doc_id, t FROM toks WHERE len(t) >= 1),
ch AS (
  SELECT doc_id, i AS idx,
         array_to_string(list_slice(t, i*10 + 1, i*10 + 10), ' ') AS chunk
  FROM base, unnest(range((len(t) + 9) // 10)) AS u(i)
),
r AS (
  SELECT doc_id, idx, chunk,
         row_number() OVER (
           PARTITION BY md5(chunk) ORDER BY doc_id, idx
         ) AS rn
  FROM ch
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_chunks,
       md5(coalesce(
         string_agg(CASE WHEN rn = 1 THEN chunk END, ' ' ORDER BY idx),
         '')) AS cleaned_md5
FROM r GROUP BY doc_id
"""


@register_extra("chunk_dedup_stats", _CHUNK_DEDUP_ORACLE)
def chunk_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level exact substring dedup (operators/textops.py::
    chunk_dedup): 10-token windows, global first-occurrence-wins,
    per-doc dup counts + cleaned-text md5. The oracle replicates the
    full window/row_number/rebuild relational program in DuckDB."""
    from ..operators.textops import chunk_dedup

    return chunk_dedup(_t(spark, sf_dir, "documents"), chunk=10)


_DOMAIN_MIX_ORACLE = """
WITH counts AS (
  SELECT source, count(*) AS n_s FROM documents GROUP BY source
),
tot AS (SELECT sum(n_s) AS n, count(*) AS s FROM counts),
b AS (
  SELECT d.doc_id, d.source,
         CAST(('0x' || substr(md5('mix:' || CAST(d.doc_id AS VARCHAR)),
                              1, 7))::BIGINT % 1000000 AS BIGINT) AS bucket
  FROM documents d
)
SELECT b.doc_id, b.source,
       (b.bucket * tot.s * c.n_s < tot.n * 1000000) AS kept
FROM b JOIN counts c ON c.source = b.source CROSS JOIN tot
"""


@register_extra("domain_mix_sample", _DOMAIN_MIX_ORACLE)
def domain_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixing resample (the DoReMi/Pile data-mixing shape with a
    uniform target): downsample each source toward an equal share —
    keep probability p_s = min(1, N / (S * n_s)) — via the same
    stable-under-append md5 bucketing as dataset_split. The keep
    decision is the INTEGER cross-multiplication
    ``bucket * S * n_s < N * 1e6`` (no float ratio to disagree across
    engines). Per-source counts are an S-row dim: partial-agg shuffle,
    then broadcast back — the fact table is scanned once and never
    reshuffled."""
    d = _t(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count("*").alias("n_s"))
    from ..operators._guard import collect_dim

    crows = collect_dim(counts, "domain_mix source counts")
    n = sum(r["n_s"] for r in crows)
    s = len(crows)
    bucket = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(F.lit("mix:"), F.col("doc_id").cast("string"))
                    .cast("binary")
                ),
                1,
                7,
            ),
            16,
            10,
        ).cast("long")
        % 1000000
    )
    return (
        d.select("doc_id", "source", bucket.alias("bucket"))
        .join(F.broadcast(counts), "source")
        .select(
            "doc_id",
            "source",
            (
                F.col("bucket") * F.lit(int(s)) * F.col("n_s")
                < F.lit(int(n)) * 1000000
            ).alias("kept"),
        )
    )


_TFIDF_ORACLE = """
WITH toks AS (
  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> ''))
           AS word
  FROM documents
),
tf AS (SELECT doc_id, word, count(*) AS tf FROM toks GROUP BY 1, 2),
df AS (SELECT word, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
n AS (SELECT count(*) AS n_docs FROM documents),
top AS (
  SELECT tf.doc_id, tf.word, tf.tf, df.df, n.n_docs,
         row_number() OVER (
           PARTITION BY tf.doc_id ORDER BY tf.tf DESC, tf.word
         ) AS rn
  FROM tf JOIN df USING (word) CROSS JOIN n
)
SELECT doc_id, word AS term, CAST(tf AS BIGINT) AS tf,
       CAST(df AS BIGINT) AS df,
       CAST(round(tf * ln(CAST(n_docs AS DOUBLE) / df), 4) AS DOUBLE)
         AS tfidf_r4
FROM top WHERE rn = 1
"""


@register_extra("tfidf_top_term", _TFIDF_ORACLE)
def tfidf_top_term(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top term by term frequency with its tf-idf score —
    the keyword-extraction primitive. The RANKING is integer-only
    (tf desc, word asc): floats never order anything cross-engine; the
    tf-idf value itself is a single double product rounded to 4 dp
    (the bigram-LM precedent). Plan: one explode + (doc,word) partial
    agg; df is a vocab-sized dim broadcast back; top-1 per doc rides
    the tf shuffle's partitioning."""
    d = _t(spark, sf_dir, "documents")
    n_docs = d.count()
    toks = d.select(
        "doc_id",
        F.explode(
            F.filter(F.split("text", " "), lambda x: x != "")
        ).alias("word"),
    )
    tf = toks.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    df = toks.distinct().groupBy("word").agg(F.count("*").alias("df"))
    w = Window.partitionBy("doc_id").orderBy(F.desc("tf"), F.asc("word"))
    return (
        tf.join(F.broadcast(df), "word")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            F.col("word").alias("term"),
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
            F.round(
                F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 4
            ).alias("tfidf_r4"),
        )
    )


_BPE_PAIR_ORACLE = r"""
WITH w AS (
  SELECT word, count(*) AS cnt FROM (
    SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS word
    FROM documents
  ) WHERE word <> '' GROUP BY 1
),
sym AS (SELECT word, cnt, length(word) AS L FROM w),
pairs AS (
  SELECT substr(word, CAST(i AS INT), 1) AS a,
         substr(word, CAST(i AS INT) + 1, 1) AS b, cnt
  FROM sym, unnest(range(1, L)) AS t(i)
  UNION ALL
  SELECT substr(word, CAST(L AS INT), 1), '</w>', cnt FROM sym
)
SELECT a, b, CAST(sum(cnt) AS BIGINT) AS n FROM pairs GROUP BY 1, 2
"""


@register("bpe_pair_counts", _BPE_PAIR_ORACLE)
def bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BPE trainer's per-round kernel (operators/bpe.py): word-
    frequency dict (the trainer's ONE corpus pass) -> symbolize ->
    adjacent-pair counts weighted by word frequency. SQL-expressible,
    so this round kernel is oracle-gated; the iterative merge loop
    around it is verified against a from-scratch serial reference in
    tests/test_bpe.py (merge lists must be identical)."""
    from ..operators import bpe

    docs = _t(spark, sf_dir, "documents").select("text")
    return bpe.pair_counts(bpe.symbolize(bpe.word_freqs(docs)))


_BM25_ORACLE = """
WITH toks AS (
  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> ''))
           AS word
  FROM documents
),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
stats AS (
  SELECT CAST(count(*) AS DOUBLE) AS n_docs,
         CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
  FROM dl
),
q(query_id, word) AS (
  VALUES ('q1','hash'),('q1','join'),
         ('q2','vector'),('q2','scan'),('q2','filter'),
         ('q3','spark'),('q3','stream')
),
tf AS (
  SELECT doc_id, word, count(*) AS tf FROM toks
  WHERE word IN (SELECT word FROM q) GROUP BY 1, 2
),
dfreq AS (SELECT word, count(*) AS df FROM tf GROUP BY 1),
term AS (
  SELECT q.query_id, tf.doc_id,
         round(
           (ln((stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0)
            * (tf.tf * 2.2))
           / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)),
           4) AS s
  FROM tf JOIN dfreq USING (word) JOIN q USING (word)
          JOIN dl USING (doc_id) CROSS JOIN stats
)
SELECT query_id, doc_id,
       CAST(count(*) AS BIGINT) AS n_terms,
       CAST(sum(CAST(s AS DECIMAL(18,4))) AS DOUBLE) AS bm25_r4
FROM term GROUP BY 1, 2
"""


@register_extra("bm25_retrieval", _BM25_ORACLE)
def bm25_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 retrieval scoring (k1=1.2, b=0.75) of 3 fixed multi-term
    queries against the documents corpus — the inverted-index primitive
    behind retrieval-based dedup/contamination checks. Scale shape: the
    corpus is tokenized ONCE and immediately left-semi-joined to the
    (broadcast) query vocabulary, so tf/df aggregates touch only
    postings for query terms — the inverted-index access pattern,
    never a full-vocab aggregate; corpus stats (n_docs, avgdl =
    exact-integer sum(dl)/count) ride a broadcast 1-row cross join,
    no driver collect. Float discipline: each term's score is one
    IEEE-exact product/division chain off a single ln() (the tfidf_r4
    precedent), rounded to 4 dp PER TERM, then summed as exact
    DECIMAL(18,4) — the cross-query sum is order- and
    engine-independent by construction."""
    d = _t(spark, sf_dir, "documents")
    words = F.filter(F.split("text", " "), lambda x: x != "")
    dl = d.select("doc_id", F.size(words).alias("dl"))
    stats = dl.agg(
        F.count("*").cast("double").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )
    qterms = spark.createDataFrame(
        [
            ("q1", "hash"), ("q1", "join"),
            ("q2", "vector"), ("q2", "scan"), ("q2", "filter"),
            ("q3", "spark"), ("q3", "stream"),
        ],
        "query_id string, word string",
    )
    toks = d.select("doc_id", F.explode(words).alias("word"))
    postings = toks.join(
        F.broadcast(qterms.select("word").distinct()), "word", "left_semi"
    )
    tf = postings.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("word").agg(F.count("*").alias("df"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    denom = F.col("tf") + 1.2 * (0.25 + 0.75 * F.col("dl") / F.col("avgdl"))
    term = (
        tf.join(F.broadcast(dfreq), "word")
        .join(F.broadcast(qterms), "word")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id",
            "doc_id",
            F.round((idf * (F.col("tf") * 2.2)) / denom, 4).alias("s"),
        )
    )
    return term.groupBy("query_id", "doc_id").agg(
        F.count("*").cast("long").alias("n_terms"),
        F.sum(F.col("s").cast("decimal(18,4)")).cast("double").alias("bm25_r4"),
    )


@register_extra(
    "streaming_interval_join",
    """
    SELECT er.event_id AS error_id, c.event_id AS click_id
    FROM events er JOIN events c
      ON c.user_id = er.user_id AND c.event_type = 'click'
     AND c.ts >= er.ts AND c.ts < er.ts + INTERVAL 2 HOUR
    WHERE er.event_type = 'error'
    """,
)
def streaming_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join (streaming/joins.py) drained with
    Trigger.AvailableNow — the STREAMING twin of range_join_windows.
    Both sides carry watermarks and the join condition is an event-time
    range, so Spark bounds the retained state (clicks older than
    watermark + 10 min evicted) — the property that lets the join run
    forever at production rates. Oracle is the exact batch inner range
    join; multi-microbatch state retention (click arriving a batch
    after its error) is pytest-gated in tests/test_streaming.py."""
    import os
    import tempfile

    from ..streaming import joins as sj

    work = tempfile.mkdtemp(prefix="stream_ij_")
    src = os.path.join(work, "src")
    os.makedirs(src)
    os.symlink(f"{sf_dir}/events.parquet", os.path.join(src, "part-0.parquet"))
    out = os.path.join(work, "out")
    # 2-hour window: denser pair set at gate scale (the 10-min default
    # yields only ~4 sf0.01 pairs; the batch-twin 10-min semantics stay
    # gated by range_join_windows)
    sj.run_available_now(
        spark,
        src,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
        out,
        os.path.join(work, "ckpt"),
        gap="2 hours",
        watermark="4 hours",
    )
    return spark.read.parquet(out)


@register(
    "prefix_filter_jaccard",
    """
    WITH t AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
      FROM documents
    ),
    d AS (
      SELECT doc_id,
             list_distinct([w[i] || ' ' || w[i + 1]
                            for i in range(1, len(w))]) AS s
      FROM t WHERE len(w) >= 2
    ),
    p AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             len(list_intersect(a.s, b.s)) AS i,
             len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS u
      FROM d a JOIN d b ON b.doc_id > a.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(round(i * 1.0 / u, 4) AS DOUBLE) AS jaccard
    FROM p WHERE 5 * i >= 3 * u
    ORDER BY doc_a, doc_b
    """,
)
def prefix_filter_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Jaccard >= 0.6 self-join over bigram-shingle sets via
    prefix filtering (operators/dedup.py::prefix_filter_jaccard_join) —
    recall-1 precision-1, completing the near-dup ladder's exact end
    (MinHash/SimHash are probabilistic). The oracle is the INDEPENDENT
    brute-force O(n^2) join, so a hash match proves the prefix-filter
    candidate generation misses no qualifying pair on this corpus.
    Threshold compare is all-integer (5*|I| >= 3*|U|); jaccard output
    is int/int division rounded 4 dp (house float discipline)."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.filter(F.split("text", " "), lambda x: x != "").alias("w")
    )
    shingled = d.filter(F.size("w") >= 2).select(
        "doc_id",
        F.expr(
            "array_distinct(transform(sequence(0, size(w) - 2),"
            " i -> concat(w[i], ' ', w[i + 1])))"
        ).alias("s"),
    )
    from ..operators.dedup import prefix_filter_jaccard_join

    pairs = prefix_filter_jaccard_join(
        shingled, id_col="doc_id", set_col="s", theta_num=3, theta_den=5
    )
    return pairs.select(
        "doc_a",
        "doc_b",
        F.round(F.col("inter").cast("double") / F.col("union"), 4)
        .cast("double")
        .alias("jaccard"),
    ).orderBy("doc_a", "doc_b")


@register_extra(
    "profile_documents",
    """
    WITH long AS (
      SELECT 'doc_id' AS col_name, CAST(doc_id AS VARCHAR) AS val FROM documents
      UNION ALL SELECT 'text', text FROM documents
      UNION ALL SELECT 'lang', lang FROM documents
      UNION ALL SELECT 'source', source FROM documents
      UNION ALL SELECT 'n_chars', CAST(n_chars AS VARCHAR) FROM documents
    ),
    stats AS (
      SELECT col_name,
             count(*) AS n_rows,
             count(*) - count(val) AS n_null,
             count(DISTINCT val) AS n_distinct,
             CAST(min(length(val)) AS BIGINT) AS min_len,
             CAST(max(length(val)) AS BIGINT) AS max_len
      FROM long GROUP BY 1
    ),
    h AS (
      SELECT col_name,
             ('0x' || substr(md5('hll:' || val), 1, 15))::BIGINT AS h60
      FROM long WHERE val IS NOT NULL
    ),
    r AS (
      SELECT col_name, h60 % 1024 AS b,
             CASE WHEN h60 // 1024 = 0 THEN 51
                  ELSE 51 - length(bin(h60 // 1024)) END AS rho
      FROM h
    ),
    regs AS (SELECT col_name, b, max(rho) AS reg FROM r GROUP BY 1, 2),
    agg AS (
      SELECT col_name,
             sum(1::BIGINT << CAST(51 - reg AS INT)) AS s_present,
             count(*) AS nb
      FROM regs GROUP BY 1
    ),
    est AS (
      SELECT col_name,
             1.7013287633207432e+21 /
               CAST(s_present + (1024 - nb) * 2251799813685248 AS DOUBLE)
               AS e_raw,
             1024 - nb AS v
      FROM agg
    ),
    hll AS (
      SELECT col_name,
             -- double round mirrors the Spark side exactly:
             -- hll_estimate is 4-dp-rounded, then rounded to integer
             CAST(round(round(CASE WHEN v > 0 AND e_raw <= 2560.0
                                   THEN 1024.0 * ln(1024.0 / v)
                                   ELSE e_raw END, 4), 0) AS BIGINT)
               AS approx_distinct
      FROM est
    )
    SELECT s.col_name AS col_name, s.n_rows, s.n_null, s.n_distinct,
           hll.approx_distinct, s.min_len, s.max_len
    FROM stats s JOIN hll USING (col_name)
    ORDER BY col_name
    """,
)
def profile_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table profiler (the warehouse ANALYZE utility): per-column row /
    null / exact-distinct / HLL-approx-distinct / length bounds over a
    stack()-longified single scan. At 10^12 rows you'd drop the exact
    n_distinct column and keep the sketch (same register table the
    snaptable stats could persist per file); lengths and counts are
    integer partial aggregates. The oracle replays the stack as UNION
    ALL and the full register algebra grouped by column name."""
    from ..operators import sketches as sk

    d = _t(spark, sf_dir, "documents")
    pairs = []
    for c in ["doc_id", "text", "lang", "source", "n_chars"]:
        pairs += [f"'{c}'", f"CAST({c} AS STRING)"]
    long = d.select(
        F.expr(f"stack(5, {', '.join(pairs)}) AS (col_name, val)")
    )
    stats = long.groupBy("col_name").agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.count(F.lit(1)) - F.count("val")).alias("n_null"),
        F.countDistinct("val").alias("n_distinct"),
        F.min(F.length("val")).cast("long").alias("min_len"),
        F.max(F.length("val")).cast("long").alias("max_len"),
    )
    regs = sk.hll_registers(
        long.filter(F.col("val").isNotNull()), ["col_name"], "val"
    )
    est = sk.hll_estimate(regs, ["col_name"]).select(
        "col_name",
        F.round("hll_estimate", 0).cast("long").alias("approx_distinct"),
    )
    return (
        stats.join(F.broadcast(est), "col_name")
        .select(
            "col_name", "n_rows", "n_null", "n_distinct", "approx_distinct",
            "min_len", "max_len",
        )
        .orderBy("col_name")
    )


@register_extra(
    "stratified_sample",
    """
    WITH d AS (
      SELECT doc_id, source,
             substr(md5(concat(CAST(doc_id AS VARCHAR), ':', source)),
                    1, 1) AS bucket,
             CASE CAST(substr(source, 4) AS INT) % 3
               WHEN 0 THEN '4' WHEN 1 THEN '8' ELSE 'c' END AS thr
      FROM documents
    )
    SELECT doc_id, source, bucket
    FROM d WHERE bucket < thr
    ORDER BY doc_id
    """,
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-stratified corpus sampling: each source
    stratum keeps a fixed fraction (25/50/75% by stratum class) of its
    documents, membership decided by an md5 bucket of the (doc_id,
    source) key — NOT by rand(). That determinism is the scale property
    that matters on a real cluster: rand()-based sampling changes under
    task retries, partition re-splits, and AQE re-plans (Spark
    re-executes lost partitions from scratch), silently breaking
    train/eval hygiene; a content-hash membership test is reproducible
    under any physical execution, needs no seed-state shuffle, and is a
    pure stateless filter that pushes to the scan side. Hex-prefix
    comparison is lexicographic == numeric (fixed width, lowercase in
    both engines)."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.substring(
            F.md5(
                F.concat(
                    F.col("doc_id").cast("string"),
                    F.lit(":"),
                    F.col("source"),
                )
            ),
            1,
            1,
        ).alias("bucket"),
        F.expr(
            "CASE CAST(substr(source, 4) AS INT) % 3"
            " WHEN 0 THEN '4' WHEN 1 THEN '8' ELSE 'c' END"
        ).alias("thr"),
    )
    return (
        d.filter(F.col("bucket") < F.col("thr"))
        .select("doc_id", "source", "bucket")
        .orderBy("doc_id")
    )


@register_extra(
    "source_mixture_weights",
    """
    WITH s AS (
      SELECT source, count(*) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS n_chars
      FROM documents GROUP BY source
    ),
    tot AS (SELECT sum(n_chars) AS tot_chars FROM s),
    sh AS (
      SELECT source, n_docs, n_chars,
             pow(CAST(n_chars AS DOUBLE) / tot_chars, 0.7) AS pw,
             CAST(n_chars AS DOUBLE) / tot_chars AS share
      FROM s CROSS JOIN tot
    ),
    z AS (SELECT sum(pw) AS zsum FROM sh)
    SELECT source, n_docs, n_chars,
           CAST(round(pw / zsum, 4) AS DOUBLE) AS weight,
           CAST(round(pw / zsum / share, 4) AS DOUBLE) AS upsample
    FROM sh CROSS JOIN z
    ORDER BY source
    """,
)
def source_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based data-mixture weights (the multilingual/
    multi-source training recipe): per-source sampling weight
    proportional to share^0.7, i.e. small sources get upsampled,
    dominant ones damped. Every normalizer (total chars, partition
    function) is a broadcast 1-row aggregate joined in-plan — no driver
    collect, so the mixture recomputes correctly however large the
    corpus. pow() may differ by an ulp across libms (JVM vs C), three
    orders of magnitude under the 4-dp rounding."""
    s = (
        _t(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("n_chars"),
        )
    )
    tot = s.agg(F.sum("n_chars").cast("double").alias("tot_chars"))
    sh = s.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_chars",
        F.pow(F.col("n_chars") / F.col("tot_chars"), 0.7).alias("pw"),
        (F.col("n_chars") / F.col("tot_chars")).alias("share"),
    )
    z = sh.agg(F.sum("pw").alias("zsum"))
    return (
        sh.crossJoin(F.broadcast(z))
        .select(
            "source",
            "n_docs",
            "n_chars",
            F.round(F.col("pw") / F.col("zsum"), 4).alias("weight"),
            F.round(F.col("pw") / F.col("zsum") / F.col("share"), 4).alias(
                "upsample"
            ),
        )
        .orderBy("source")
    )


# ------------------------------------------------------- power iteration


def _pc_iter_sql(x: str, vprev: str, s: str, w: str, v: str) -> str:
    """One power-iteration round as CTE text (DECIMAL-exact sums)."""
    return f"""{s} AS (
      SELECT x.vec_id,
             CAST(sum(CAST(x.x * v.w AS DECIMAL(38,18))) AS DOUBLE) AS s
      FROM {x} x JOIN {vprev} v ON v.j = x.j GROUP BY 1
    ),
    {w} AS (
      SELECT x.j, sum(CAST(x.x * s.s AS DECIMAL(38,18))) AS wsum
      FROM {x} x JOIN {s} s ON s.vec_id = x.vec_id GROUP BY 1
    ),
    {v} AS (
      SELECT j, CAST(wsum AS DOUBLE) / (
        SELECT sqrt(CAST(sum(CAST(
          CAST(wsum AS DOUBLE) * CAST(wsum AS DOUBLE)
          AS DECIMAL(38,18))) AS DOUBLE)) FROM {w}
      ) AS w
      FROM {w}
    )"""


@register_extra(
    "embedding_top_pc_projection",
    """
    WITH x AS (
      SELECT vec_id, label, u.j AS j, embedding[u.j + 1] AS x
      FROM embeddings, unnest(range(64)) AS u(j)
    ),
    v0 AS (SELECT u.j AS j, CAST(0.125 AS DOUBLE) AS w
           FROM unnest(range(64)) AS u(j)),
    """
    + _pc_iter_sql("x", "v0", "s1", "w1", "v1")
    + ","
    + _pc_iter_sql("x", "v1", "s2", "w2", "v2")
    + """,
    sf AS (
      SELECT x.vec_id,
             CAST(sum(CAST(x.x * v.w AS DECIMAL(38,18))) AS DOUBLE) AS s
      FROM x JOIN v2 v ON v.j = x.j GROUP BY 1
    )
    SELECT e.label, count(*) AS n_vecs,
           round(CAST(sum(CAST(sf.s AS DECIMAL(38,18))) AS DOUBLE)
                 / count(*), 6) AS mean_proj
    FROM embeddings e JOIN sf ON sf.vec_id = e.vec_id
    GROUP BY 1 ORDER BY 1
    """,
)
def embedding_top_pc_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed power iteration for the corpus's top principal
    direction (2 rounds from the exact v0 = 1/8 vector), then per-label
    mean projections — the iterative-linear-algebra member of the ML
    family next to k-means (IVF) and PageRank. Every floating sum that
    crosses a shuffle is per-row quantized to DECIMAL(38,18) and summed
    exactly (the bigram-LM / trend-line discipline), so each round is
    bit-reproducible regardless of partitioning, merge order, or
    engine; the only driver-side datum per round is the 64-long
    component vector (collect_dim'd — dimension-sized by definition).
    Scale shape: the exploded corpus is hash-partitioned by vec_id
    ONCE (lineage-cut); every round's per-vector dot (groupBy vec_id,
    decimal sums — Spark's decimal SUM preserves scale where a
    chained decimal `+` would clamp it, which is why the dot is an
    aggregate and not an F.aggregate array fold) and the s-join reuse
    that partitioning, so the only per-round Exchange is the 64-key
    (j, decimal) component aggregation. The oracle unrolls both
    rounds as CTEs over an indexed unnest."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    from ..operators._guard import collect_dim

    D = 64
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "label", "embedding"
    )
    # one exploded, vec_id-partitioned form serves every round: the
    # per-vector dot (groupBy vec_id) and the s-join reuse this
    # partitioning, so each round's only new Exchange is the 64-key
    # (j, decimal) component aggregation
    pe = (
        emb.select("vec_id", F.posexplode("embedding").alias("j", "x"))
        .repartition("vec_id")
        .localCheckpoint(eager=True)
    )

    def s_table(v):
        vlit = F.array(*[F.lit(float(wj)) for wj in v])
        prod = (
            F.col("x").cast("double")
            * F.element_at(vlit, F.col("j") + 1)
        ).cast("decimal(38,18)")
        return (
            pe.select("vec_id", prod.alias("p"))
            .groupBy("vec_id")
            .agg(F.sum("p").cast("double").alias("s"))
        )

    v = [0.125] * D
    for _ in range(2):
        st = s_table(v)
        sums = (
            pe.join(st, "vec_id")
            .select(
                "j",
                (F.col("x").cast("double") * F.col("s")).cast(
                    "decimal(38,18)"
                ).alias("c"),
            )
            .groupBy("j")
            .agg(F.sum("c").alias("wsum"))
        )
        rows = collect_dim(sums, "embedding_top_pc component")
        wmap = {int(r["j"]): r["wsum"] for r in rows}
        wd = [float(wmap[j]) for j in range(D)]
        norm2 = sum(
            (
                Decimal(wj * wj).quantize(
                    Decimal("1e-18"), rounding=ROUND_HALF_UP
                )
                for wj in wd
            ),
            Decimal(0),
        )
        nrm = math.sqrt(float(norm2))
        v = [wj / nrm for wj in wd]

    proj = emb.select("vec_id", "label").join(s_table(v), "vec_id")
    return (
        proj.groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            F.round(
                F.sum(F.col("s").cast("decimal(38,18)")).cast("double")
                / F.count("*"),
                6,
            ).alias("mean_proj"),
        )
        .orderBy("label")
    )


# sliding-window document chunking: the context-window packing
# precursor every LLM training pipeline runs (fixed chunk length with
# stride overlap so no boundary context is lost). All-integer chunk
# math (ceil via integer div) and whitespace tokens, so both engines
# emit identical chunk texts byte-for-byte.
@register(
    "doc_chunks_overlap",
    """
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks,
             length(string_split(text, ' ')) AS n
      FROM documents
    ),
    c AS (
      SELECT doc_id, toks, n,
             CAST((greatest(0, n - 32) + 23) // 24 + 1 AS INT) AS nchunks
      FROM t
    ),
    e AS (
      SELECT doc_id, toks, n,
             CAST(unnest(range(nchunks)) AS INT) AS chunk_idx
      FROM c
    )
    SELECT doc_id, chunk_idx,
           CAST(chunk_idx * 24 AS INT) AS start_tok,
           CAST(least(chunk_idx * 24 + 32, n) - chunk_idx * 24 AS INT)
             AS n_toks,
           array_to_string(
             toks[chunk_idx * 24 + 1 : least(chunk_idx * 24 + 32, n)], ' '
           ) AS chunk_text
    FROM e ORDER BY doc_id, chunk_idx
    """,
)
def doc_chunks_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking with overlap (chunk 32 tokens, stride
    24): one generator expression per doc — split, integer chunk-count,
    posexplode over a sequence, slice + rejoin. Zero shuffle and zero
    Python: at 10^12 docs this is a map-only pass whose output feeds
    sequence_packing / embedding backfill. The final chunk is the
    remainder (never empty, never duplicated); docs shorter than one
    chunk emit exactly one chunk."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    nchunks = F.expr("(greatest(0, size(split(text, ' ')) - 32) + 23) div 24 + 1")
    start = F.col("chunk_idx") * 24
    end = F.least(start + 32, F.col("n"))
    return (
        docs.select(
            "doc_id",
            toks.alias("toks"),
            n.alias("n"),
            F.explode(F.sequence(F.lit(0), (nchunks - 1).cast("int"))).alias(
                "chunk_idx"
            ),
        )
        .select(
            "doc_id",
            F.col("chunk_idx").cast("int").alias("chunk_idx"),
            start.cast("int").alias("start_tok"),
            (end - start).cast("int").alias("n_toks"),
            F.array_join(
                F.slice(F.col("toks"), start + 1, end - start), " "
            ).alias("chunk_text"),
        )
        .orderBy("doc_id", "chunk_idx")
    )


# PMI collocation mining (phrase extraction): the statistic behind
# "new_york -> one token" merge lists in corpus preprocessing. The PMI
# ratio c_xy * N_u^2 / (c_x * c_y * N_b) is emitted as a SCALED
# INTEGER via two floor divisions applied in the same order by both
# engines (a log() would tie the hash to libm) — so lift > 1 shows as
# ratio_e6 > 1_000_000 and the hash gates the whole counting pipeline.
@register_extra(
    "pmi_collocations",
    """
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    u AS (SELECT unnest(toks) AS tok FROM t),
    uni AS (SELECT tok, count(*) AS c FROM u GROUP BY tok),
    nu AS (SELECT sum(c) AS n_u FROM uni),
    i AS (
      SELECT toks, unnest(range(length(toks) - 1)) AS i FROM t
    ),
    bg AS (SELECT toks[i + 1] AS x, toks[i + 2] AS y FROM i),
    big AS (SELECT x, y, count(*) AS c_xy FROM bg GROUP BY x, y),
    nb AS (SELECT sum(c_xy) AS n_b FROM big),
    j AS (
      SELECT b.x, b.y, b.c_xy, ux.c AS c_x, uy.c AS c_y, nu.n_u, nb.n_b
      FROM big b
      JOIN uni ux ON ux.tok = b.x
      JOIN uni uy ON uy.tok = b.y
      CROSS JOIN nu CROSS JOIN nb
    )
    SELECT x, y, CAST(c_xy AS BIGINT) AS c_xy,
           CAST(((c_xy * 1000000 * n_u) // c_x) * n_u // (c_y * n_b)
                AS BIGINT) AS ratio_e6
    FROM j WHERE c_xy >= 20 ORDER BY x, y
    """,
)
def pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram collocations with integer-scaled PMI lift over the
    document corpus: unigram + bigram counts (two partial-agg
    shuffles on token keys), the two grand totals ride broadcast 1-row
    aggregates, and the scoring join is vocabulary-sized — never
    corpus-sized. At 10^12 docs this is the standard phrase-mining
    pass before tokenizer training (the BPE trainer next door shares
    the counting shape)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    t = docs.select(F.split(F.col("text"), " ").alias("toks"))
    uni = (
        t.select(F.explode("toks").alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
    )
    nu = uni.agg(F.sum("c").alias("n_u"))
    bg = t.select(
        F.explode(
            F.expr(
                "transform(sequence(0, size(toks) - 2),"
                " i -> struct(toks[i] AS x, toks[i + 1] AS y))"
            )
        ).alias("p")
    ).select("p.x", "p.y")
    big = bg.groupBy("x", "y").agg(F.count("*").alias("c_xy"))
    nb = big.agg(F.sum("c_xy").alias("n_b"))
    j = (
        big.join(uni.select(F.col("tok").alias("x"), F.col("c").alias("c_x")), "x")
        .join(uni.select(F.col("tok").alias("y"), F.col("c").alias("c_y")), "y")
        .crossJoin(F.broadcast(nu))
        .crossJoin(F.broadcast(nb))
    )
    ratio = F.expr("((c_xy * 1000000 * n_u) div c_x) * n_u div (c_y * n_b)")
    return (
        j.filter(F.col("c_xy") >= 20)
        .select(
            "x", "y",
            F.col("c_xy").cast("bigint").alias("c_xy"),
            ratio.cast("bigint").alias("ratio_e6"),
        )
        .orderBy("x", "y")
    )


@register_extra(
    "exact_substring_spans",
    """
    WITH pos AS (
      SELECT doc_id, text,
             unnest(range(1, CAST(n_chars AS BIGINT) - 38)) AS i
      FROM documents WHERE n_chars >= 40
    ), dg AS (
      SELECT DISTINCT doc_id, md5(substr(text, CAST(i AS INT), 40)) AS h
      FROM pos
    ), keep AS (
      SELECT h FROM dg GROUP BY h HAVING count(*) BETWEEN 2 AND 8
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           count(*) AS shared_grams
    FROM dg a JOIN keep USING (h) JOIN dg b USING (h)
    WHERE a.doc_id < b.doc_id
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def exact_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplicate spans (the suffix-array dedup signal of
    Lee et al., "Deduplicating Training Data Makes Language Models
    Better"): doc pairs sharing a verbatim >=40-char substring, scored
    by how many distinct 40-char rolling grams they share (a contiguous
    duplicated span of S chars contributes S-39 grams, so the count is
    a span-length proxy). Plan: explode rolling grams, hash each to a
    fixed 16-byte md5 so the dedup/posting shuffles never carry text;
    one groupBy(h) builds sorted posting lists with a document-frequency
    cap (2..8 — grams in >8 docs are boilerplate, dropped exactly as
    production suffix-array dedup drops high-DF spans), pairs fan out
    from the capped lists (<=28 per gram, never all-pairs), and one
    count shuffle on (doc_a, doc_b) finishes. Both shuffles carry
    fixed-width keys; the gram explode is map-side only."""
    d = _t(spark, sf_dir, "documents")
    pos = d.filter(F.col("n_chars") >= 40).select(
        "doc_id",
        "text",
        F.explode(
            F.sequence(F.lit(1), F.col("n_chars").cast("int") - 39)
        ).alias("i"),
    )
    grams = pos.select(
        "doc_id",
        F.md5(F.expr("substring(text, i, 40)").cast("binary")).alias("h"),
    )
    # no pre-distinct: collect_set dedups doc_ids per gram inside the
    # ONE groupBy(h) shuffle (map-side partial sets), saving the full
    # (doc_id, h) exchange a .distinct() would add
    posting = (
        grams.groupBy("h")
        .agg(F.sort_array(F.collect_set("doc_id")).alias("docs"))
        .filter((F.size("docs") >= 2) & (F.size("docs") <= 8))
    )
    pairs = posting.select(
        F.explode(
            F.expr(
                "flatten(transform(docs, (a, i) ->"
                " transform(slice(docs, i + 2, size(docs)),"
                " b -> struct(a AS doc_a, b AS doc_b))))"
            )
        ).alias("p")
    ).select("p.doc_a", "p.doc_b")
    return (
        pairs.groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("shared_grams"))
        .orderBy("doc_a", "doc_b")
    )


@register_extra(
    "embedding_outliers",
    """
    WITH q AS (
      SELECT vec_id,
             list_transform(embedding,
                 e -> CAST(floor(CAST(e AS DOUBLE) * 10000) AS BIGINT)
             ) AS q
      FROM embeddings
    ), expl AS (
      SELECT vec_id, unnest(range(1, len(q) + 1)) AS d, unnest(q) AS v
      FROM q
    ), dims AS (
      SELECT d, sum(v) AS s, count(*) AS n FROM expl GROUP BY d
    ), cent AS (
      SELECT list(CAST(floor(CAST(s AS DOUBLE) / n) AS BIGINT)
                  ORDER BY d) AS carr
      FROM dims
    ), dist AS (
      SELECT vec_id,
             CAST(list_sum(list_transform(range(1, len(q) + 1),
                 i -> (q[i] - carr[i]) * (q[i] - carr[i])))
             AS BIGINT) AS dist2_q
      FROM q, cent
    ), thr AS (
      SELECT quantile_disc(dist2_q, 0.975) AS t FROM dist
    )
    SELECT vec_id, dist2_q, dist2_q > t AS is_outlier
    FROM dist, thr ORDER BY vec_id
    """,
)
def embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space outlier screen (the CLIP-style curation filter:
    drop vectors far from the corpus centroid before near-dup / ANN
    passes). All-integer pipeline so both engines agree bit-for-bit
    with zero float-ordering risk: components quantize to 1e-4 via
    floor (no tie ambiguity), per-dim sums are exact BIGINTs from one
    partial-agg shuffle with 64 keys, the quantized centroid and the
    P97.5 discrete-percentile cutoff each ride back as broadcast 1-row
    aggregates, and the squared distance is a JVM-side zip_with fold
    bounded by 64*(2e4)^2 — no overflow at any corpus size. At 100 TB
    the percentile input is the 16-byte (vec_id, dist2) projection,
    never the vectors; swap percentile_disc for a two-pass counting
    threshold if even that sort must be avoided."""
    e = _t(spark, sf_dir, "embeddings")
    q = e.select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * 10000).cast("bigint"),
        ).alias("q"),
    )
    dims = (
        q.select(F.posexplode("q").alias("d", "v"))
        .groupBy("d")
        .agg(F.sum("v").alias("s"), F.count("*").alias("n"))
    )
    cent = dims.groupBy().agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("d", "s", "n"))),
            lambda x: F.floor(x["s"].cast("double") / x["n"]).cast("bigint"),
        ).alias("carr")
    )
    dist = q.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        F.aggregate(
            F.zip_with(F.col("q"), F.col("carr"), lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("dist2_q"),
    )
    thr = dist.agg(
        F.expr(
            "CAST(percentile_disc(0.975) WITHIN GROUP (ORDER BY dist2_q)"
            " AS BIGINT)"
        ).alias("t")
    )
    return (
        dist.crossJoin(F.broadcast(thr))
        .select(
            "vec_id",
            "dist2_q",
            (F.col("dist2_q") > F.col("t")).alias("is_outlier"),
        )
        .orderBy("vec_id")
    )


@register_extra(
    "skipgram_cooc",
    """
    WITH t AS (SELECT string_split(text, ' ') AS toks FROM documents),
    i AS (SELECT toks, unnest(range(len(toks))) AS i FROM t),
    d AS (SELECT unnest([-3,-2,-1,1,2,3]) AS d),
    p AS (
      SELECT toks[i + 1] AS center, toks[i + d + 1] AS context
      FROM i CROSS JOIN d
      WHERE i + d >= 0 AND i + d < len(toks)
    )
    SELECT center, context, count(*) AS c
    FROM p GROUP BY 1, 2 HAVING count(*) >= 50 ORDER BY center, context
    """,
)
def skipgram_cooc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skip-gram co-occurrence counts (window +-3, the word2vec /
    GloVe / fastText preprocessing pass): ordered (center, context)
    pair counts over the corpus with a frequency floor. Plan: the
    window fanout is a map-side generator expression (positions x
    offsets, bounds-checked inside the lambda — never a join), so the
    only shuffle is ONE partial-agg count keyed on the pair; at 10^12
    tokens the pair vocabulary, not the corpus, crosses the wire —
    the same counting shape as the BPE trainer and PMI miner."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    t = docs.select(F.split(F.col("text"), " ").alias("toks"))
    pairs = t.select(
        F.explode(
            F.expr(
                "filter(flatten(transform(sequence(0, size(toks) - 1), i ->"
                " transform(array(-3, -2, -1, 1, 2, 3), d ->"
                " named_struct('center', toks[i],"
                " 'ok', i + d >= 0 AND i + d < size(toks),"
                " 'context', toks[IF(i + d >= 0 AND i + d < size(toks),"
                " i + d, 0)]))))," 
                " p -> p.ok)"
            )
        ).alias("p")
    ).select("p.center", "p.context")
    return (
        pairs.groupBy("center", "context")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= 50)
        .orderBy("center", "context")
    )


def _perceptron_oracle() -> str:
    feats = """
      SELECT CASE WHEN (5 * (length(text) - length(replace(text, 'e', '')))
                        - 2 * len(string_split(text, ' '))
                        + (doc_id % 11) - 3) > 0 THEN 1 ELSE -1 END AS y,
             CAST(1 AS BIGINT) AS x0,
             CAST(length(text) - length(replace(text, 'e', '')) AS BIGINT) AS x1,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS x2,
             CAST(n_chars // 16 AS BIGINT) AS x3
      FROM documents
    """

    def rnd(prev: str, out: str) -> str:
        dot = f"({prev}.w0*x0 + {prev}.w1*x1 + {prev}.w2*x2 + {prev}.w3*x3)"
        ups = ", ".join(
            f"{prev}.w{i} + coalesce(sum(y*x{i}) FILTER (y*{dot} <= 0), 0)"
            f" AS w{i}"
            for i in range(4)
        )
        return (
            f"{out} AS (SELECT {ups} FROM f, {prev}"
            f" GROUP BY {prev}.w0, {prev}.w1, {prev}.w2, {prev}.w3)"
        )

    return f"""
    WITH f AS ({feats}),
    r1 AS (SELECT sum(y*x0) AS w0, sum(y*x1) AS w1,
                  sum(y*x2) AS w2, sum(y*x3) AS w3 FROM f),
    {rnd("r1", "r2")},
    {rnd("r2", "r3")},
    s AS (SELECT r1.w0 + r2.w0 + r3.w0 AS s0, r1.w1 + r2.w1 + r3.w1 AS s1,
                 r1.w2 + r2.w2 + r3.w2 AS s2, r1.w3 + r2.w3 + r3.w3 AS s3
          FROM r1, r2, r3)
    SELECT 3 AS rounds,
           CAST(s.s0 AS BIGINT) AS w0_sum, CAST(s.s1 AS BIGINT) AS w1_sum,
           CAST(s.s2 AS BIGINT) AS w2_sum, CAST(s.s3 AS BIGINT) AS w3_sum,
           (SELECT count(*) FROM f, r3
            WHERE y*(r3.w0*x0 + r3.w1*x1 + r3.w2*x2 + r3.w3*x3) <= 0)
             AS n_mis_last,
           (SELECT count(*) FROM f, s
            WHERE y*(s.s0*x0 + s.s1*x1 + s.s2*x2 + s.s3*x3) <= 0)
             AS n_mis_avg
    FROM s
    """


@register_extra("perceptron_avg_train", _perceptron_oracle())
def perceptron_avg_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed AVERAGED-perceptron training as pure dataflow (the
    fastText-style quality-classifier trainer of LLM data pipelines,
    exact-integer edition): 3 synchronous batch rounds over integer
    text features against a noisy linear concept; each round is ONE
    partial-agg scan (the misclassified-update sums) with the standing
    weights riding a broadcast 1-row aggregate. The output reports the
    summed (= averaged, sign-invariant) weights AND both error counts
    — n_mis_avg < n_mis_last on this corpus (168 vs 332 of 500), the
    classic averaged-perceptron stabilization, hash-gated. All-integer
    updates: zero float-ordering risk at any partitioning."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    e_cnt = F.length("text") - F.length(F.regexp_replace("text", "e", ""))
    f = docs.select(
        F.when(
            (
                5 * e_cnt
                - 2 * F.size(F.split("text", " "))
                + F.col("doc_id") % 11
                - 3
            )
            > 0,
            1,
        )
        .otherwise(-1)
        .cast("bigint")
        .alias("y"),
        F.lit(1).cast("bigint").alias("x0"),
        e_cnt.cast("bigint").alias("x1"),
        F.size(F.split("text", " ")).cast("bigint").alias("x2"),
        F.expr("n_chars div 16").cast("bigint").alias("x3"),
    )
    xs = ["x0", "x1", "x2", "x3"]
    ws = ["w0", "w1", "w2", "w3"]

    def dot(wcols):
        d = None
        for w, x in zip(wcols, xs):
            t = F.col(w) * F.col(x)
            d = t if d is None else d + t
        return d

    r1 = f.agg(
        *[F.sum(F.col("y") * F.col(x)).alias(w) for x, w in zip(xs, ws)]
    )
    rounds = [r1]
    cur = r1
    for _ in range(2):
        j = f.crossJoin(F.broadcast(cur))
        mis = (F.col("y") * dot(ws)) <= 0
        nxt = (
            j.groupBy(*ws)
            .agg(
                *[
                    F.coalesce(
                        F.sum(F.when(mis, F.col("y") * F.col(x))), F.lit(0)
                    ).alias(f"u{i}")
                    for i, x in enumerate(xs)
                ]
            )
            .select(
                *[
                    (F.col(w) + F.col(f"u{i}")).alias(w)
                    for i, w in enumerate(ws)
                ]
            )
        )
        rounds.append(nxt)
        cur = nxt
    # summed (averaged) weights: crossJoin the three 1-row states
    a = rounds[0].select(*[F.col(w).alias(f"a{i}") for i, w in enumerate(ws)])
    b = rounds[1].select(*[F.col(w).alias(f"b{i}") for i, w in enumerate(ws)])
    c = rounds[2].select(*[F.col(w).alias(f"c{i}") for i, w in enumerate(ws)])
    s = (
        a.crossJoin(b)
        .crossJoin(c)
        .select(
            *[
                (F.col(f"a{i}") + F.col(f"b{i}") + F.col(f"c{i}")).alias(
                    f"s{i}"
                )
                for i in range(4)
            ]
        )
    )
    last = rounds[2].select(
        *[F.col(w).alias(f"l{i}") for i, w in enumerate(ws)]
    )
    j = f.crossJoin(F.broadcast(last)).crossJoin(F.broadcast(s))
    mis_of = lambda pre: (
        F.col("y")
        * sum(F.col(f"{pre}{i}") * F.col(x) for i, x in enumerate(xs))
    ) <= 0
    out = j.agg(
        *[F.max(F.col(f"s{i}")).alias(f"w{i}_sum") for i in range(4)],
        F.sum(F.when(mis_of("l"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_mis_last"),
        F.sum(F.when(mis_of("s"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_mis_avg"),
    )
    return out.select(
        F.lit(3).alias("rounds"),
        "w0_sum",
        "w1_sum",
        "w2_sum",
        "w3_sum",
        "n_mis_last",
        "n_mis_avg",
    )


@register_extra(
    "cdc_chunk_dedup",
    """
    WITH pos AS (
      SELECT doc_id, text, unnest(range(1, CAST(n_chars AS BIGINT) + 1)) AS i
      FROM documents
    ),
    b AS (
      SELECT doc_id, text, i,
             CASE WHEN i >= 16 AND
                  ('0x' || substr(md5(substr(text, CAST(i - 15 AS INT), 16)),
                                  1, 8))::BIGINT % 64 = 0
                  THEN 1 ELSE 0 END AS cut
      FROM pos
    ),
    c AS (
      SELECT doc_id, text, i,
             coalesce(sum(cut) OVER (PARTITION BY doc_id ORDER BY i
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS ci
      FROM b
    ),
    ch AS (
      SELECT doc_id, ci, min(i) AS i0, count(*) AS chunk_len, text
      FROM c GROUP BY doc_id, ci, text
    ),
    hh AS (
      SELECT md5(substr(text, CAST(i0 AS INT), CAST(chunk_len AS INT))) AS h,
             chunk_len
      FROM ch
    )
    SELECT h AS chunk_hash, count(*) AS n_copies,
           CAST(min(chunk_len) AS BIGINT) AS chunk_len
    FROM hh GROUP BY h HAVING count(*) >= 2 ORDER BY h
    """,
)
def cdc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking dedup (the storage-dedup primitive,
    FastCDC/rsync-style): chunk boundaries fall where the hash of the
    trailing 16-gram lands in a 1/64 bucket — boundaries move WITH the
    content, so an insertion re-chunks only its neighborhood (the
    property fixed-size blocks lack). Output: chunks whose exact
    content recurs across the corpus. Plan shape (payload-safe at
    100 TB): the boundary flag is computed map-side WHERE the text
    is (one projection), then only THIN rows (doc_id, i, cut) cross
    the window shuffle; chunk extents (min pos, length) aggregate on
    the same doc-keyed partitioning; text joins back ONCE per doc to
    hash the chunk substring — the corpus never rides position rows.
    The DuckDB twin re-derives everything from the same md5 bucket
    rule."""
    d = _t(spark, sf_dir, "documents")
    pos = d.select(
        "doc_id",
        "text",
        F.explode(
            F.sequence(F.lit(1), F.col("n_chars").cast("int"))
        ).alias("i"),
    )
    cut = (
        (F.col("i") >= 16)
        & (
            F.conv(
                F.substring(
                    F.md5(F.expr("substring(text, i - 15, 16)").cast("binary")),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % 64
            == 0
        )
    ).cast("int")
    thin = pos.select("doc_id", "i", cut.alias("cut"))
    w = (
        Window.partitionBy("doc_id")
        .orderBy("i")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = thin.select(
        "doc_id", "i", F.coalesce(F.sum("cut").over(w), F.lit(0)).alias("ci")
    )
    ch = c.groupBy("doc_id", "ci").agg(
        F.min("i").alias("i0"), F.count("*").alias("chunk_len")
    )
    hh = ch.join(d.select("doc_id", "text"), "doc_id").select(
        F.md5(
            F.expr("substring(text, i0, chunk_len)").cast("binary")
        ).alias("h"),
        "chunk_len",
    )
    return (
        hh.groupBy("h")
        .agg(
            F.count("*").alias("n_copies"),
            F.min("chunk_len").cast("bigint").alias("chunk_len"),
        )
        .filter(F.col("n_copies") >= 2)
        .select(F.col("h").alias("chunk_hash"), "n_copies", "chunk_len")
        .orderBy("chunk_hash")
    )


@register_extra(
    "embedding_int8_quantize",
    """
    WITH q AS (
      SELECT vec_id,
             list_transform(embedding,
                 e -> CAST(floor(CAST(e AS DOUBLE) * 10000) AS BIGINT)
             ) AS q
      FROM embeddings
    ), expl AS (
      SELECT vec_id, unnest(range(1, len(q) + 1)) AS d, unnest(q) AS v
      FROM q
    ), rng AS (
      SELECT d, min(v) AS lo, max(v) AS hi FROM expl GROUP BY d
    )
    SELECT e.vec_id, CAST(e.d AS INT) AS dim,
           CAST(CASE WHEN r.hi > r.lo
                THEN ((e.v - r.lo) * 255) // (r.hi - r.lo)
                ELSE 0 END AS INT) AS code
    FROM expl e JOIN rng r ON r.d = e.d
    ORDER BY e.vec_id, dim
    """,
)
def embedding_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension int8 (0..255) quantization of the embedding table
    — the serving-side compression pass (4x smaller vectors before PQ/
    scalar-quantized ANN). Same all-integer discipline as
    embedding_outliers: components floor-quantize to 1e-4 BIGINTs, the
    per-dim min/max come from ONE 64-key partial-agg shuffle and ride
    back as a 64-row broadcast, and the code is exact integer
    arithmetic ((v-lo)*255 div range — no float scale factor, so both
    engines agree on every boundary). Every (vec, dim, code) row is
    hash-gated."""
    e = _t(spark, sf_dir, "embeddings")
    q = e.select(
        "vec_id",
        F.posexplode(
            F.transform(
                "embedding",
                lambda x: F.floor(x.cast("double") * 10000).cast("bigint"),
            )
        ).alias("d0", "v"),
    ).select("vec_id", (F.col("d0") + 1).alias("d"), "v")
    rng = q.groupBy("d").agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
    out = q.join(F.broadcast(rng), "d").select(
        "vec_id",
        F.col("d").cast("int").alias("dim"),
        F.when(
            F.col("hi") > F.col("lo"),
            F.expr("((v - lo) * 255) div (hi - lo)"),
        )
        .otherwise(0)
        .cast("int")
        .alias("code"),
    )
    return out.orderBy("vec_id", "dim")


_SPLIT_CASE_DOC = """
    CASE WHEN ('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)),
               1, 7))::BIGINT % 100 < 90 THEN 'train'
         WHEN ('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)),
               1, 7))::BIGINT % 100 < 95 THEN 'val'
         ELSE 'test' END
"""
_SPLIT_CASE_SRC = """
    CASE WHEN ('0x' || substr(md5('split:' || source),
               1, 7))::BIGINT % 100 < 90 THEN 'train'
         WHEN ('0x' || substr(md5('split:' || source),
               1, 7))::BIGINT % 100 < 95 THEN 'val'
         ELSE 'test' END
"""


@register_extra(
    "split_leakage_audit",
    f"""
    WITH pos AS (
      SELECT doc_id, text,
             unnest(range(1, CAST(n_chars AS BIGINT) - 38)) AS i
      FROM documents WHERE n_chars >= 40
    ), dg AS (
      SELECT DISTINCT doc_id, md5(substr(text, CAST(i AS INT), 40)) AS h
      FROM pos
    ), keep AS (
      SELECT h FROM dg GROUP BY h HAVING count(*) BETWEEN 2 AND 8
    ), pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM dg a JOIN keep USING (h) JOIN dg b USING (h)
      WHERE a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), sp AS (
      SELECT doc_id, {_SPLIT_CASE_DOC} AS s_doc, {_SPLIT_CASE_SRC} AS s_src
      FROM documents
    )
    SELECT 'by_doc' AS strategy,
           CAST(sum(CASE WHEN a.s_doc <> b.s_doc THEN 1 ELSE 0 END)
                AS BIGINT) AS n_cross,
           count(*) AS n_pairs
    FROM pairs p JOIN sp a ON a.doc_id = p.doc_a
                 JOIN sp b ON b.doc_id = p.doc_b
    UNION ALL
    SELECT 'by_source',
           CAST(sum(CASE WHEN a.s_src <> b.s_src THEN 1 ELSE 0 END)
                AS BIGINT),
           count(*)
    FROM pairs p JOIN sp a ON a.doc_id = p.doc_a
                 JOIN sp b ON b.doc_id = p.doc_b
    ORDER BY strategy
    """,
)
def split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test-contamination audit of the SPLIT itself: how many
    exact-substring duplicate pairs straddle a split boundary, under
    (a) the per-doc hash split and (b) a group-holdout split keyed on
    source. This is the check a training pipeline runs BEFORE
    training — eval-set contamination comes from dup pairs crossing
    the boundary, and the audit shows whether group-holdout actually
    helps (here it does NOT: the dup structure crosses sources, 9 vs 6
    leaked pairs — exactly the kind of finding the audit exists to
    surface). Plan: reuses the exact_substring_spans pair generator
    (DF-capped posting lists), then two doc-keyed broadcast-sized
    joins to attach split labels; counts are one partial agg."""
    pairs = exact_substring_spans(spark, sf_dir).select("doc_a", "doc_b")
    d = _t(spark, sf_dir, "documents")

    def bucket(col):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("split:"), col).cast("binary")), 1, 7
                ),
                16,
                10,
            ).cast("long")
            % 100
        )

    def split_of(col):
        b = bucket(col)
        return (
            F.when(b < 90, "train").when(b < 95, "val").otherwise("test")
        )

    sp = d.select(
        "doc_id",
        split_of(F.col("doc_id").cast("string")).alias("s_doc"),
        split_of(F.col("source")).alias("s_src"),
    )
    j = (
        pairs.join(
            sp.select(
                F.col("doc_id").alias("doc_a"),
                F.col("s_doc").alias("a_doc"),
                F.col("s_src").alias("a_src"),
            ),
            "doc_a",
        )
        .join(
            sp.select(
                F.col("doc_id").alias("doc_b"),
                F.col("s_doc").alias("b_doc"),
                F.col("s_src").alias("b_src"),
            ),
            "doc_b",
        )
    )
    agg = j.agg(
        F.sum(F.when(F.col("a_doc") != F.col("b_doc"), 1).otherwise(0))
        .cast("bigint")
        .alias("cross_doc"),
        F.sum(F.when(F.col("a_src") != F.col("b_src"), 1).otherwise(0))
        .cast("bigint")
        .alias("cross_src"),
        F.count("*").alias("n_pairs"),
    )
    by_doc = agg.select(
        F.lit("by_doc").alias("strategy"),
        F.col("cross_doc").alias("n_cross"),
        "n_pairs",
    )
    by_src = agg.select(
        F.lit("by_source").alias("strategy"),
        F.col("cross_src").alias("n_cross"),
        "n_pairs",
    )
    return by_doc.unionByName(by_src).orderBy("strategy")


@register_extra(
    "source_ks_drift",
    """
    WITH g AS (SELECT source, n_chars FROM documents),
    vals AS (SELECT DISTINCT n_chars AS v FROM g),
    gc AS (
      SELECT v, sum(c) OVER (ORDER BY v) AS cum_g
      FROM (SELECT n_chars AS v, count(*) AS c FROM g GROUP BY 1) t
    ),
    srcs AS (SELECT source, count(*) AS n_s FROM g GROUP BY 1),
    sv AS (SELECT s.source, s.n_s, v.v FROM srcs s CROSS JOIN vals v),
    sc AS (
      SELECT sv.source, sv.n_s, sv.v,
             sum(coalesce(c.c, 0)) OVER (PARTITION BY sv.source
                                         ORDER BY sv.v) AS cum_s
      FROM sv LEFT JOIN (
        SELECT source, n_chars AS v, count(*) AS c FROM g GROUP BY 1, 2
      ) c ON c.source = sv.source AND c.v = sv.v
    ),
    n AS (SELECT count(*) AS n FROM g)
    SELECT sc.source,
           CAST(max(abs(sc.cum_s * n.n - gc.cum_g * sc.n_s)) AS BIGINT)
             AS d_scaled,
           CAST(max(sc.n_s) AS BIGINT) AS n_source,
           CAST(max(n.n) AS BIGINT) AS n_total
    FROM sc JOIN gc ON gc.v = sc.v CROSS JOIN n
    GROUP BY sc.source ORDER BY sc.source
    """,
)
def source_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distribution-drift monitor: the EXACT two-sample
    Kolmogorov-Smirnov statistic between each source's n_chars
    distribution and the global one, in cross-multiplied integers
    (D_scaled = max_v |cum_s(v)*N - cum_g(v)*N_s|; divide by N*N_s for
    the classical D) — zero float risk, so the gate hashes the sup
    norm itself. The shape a mixture pipeline runs per ingest batch to
    catch a source whose length profile shifted. CDFs ride value-keyed
    windows over the DISTINCT value set (hundreds of rows), never the
    corpus; the global-CDF window is a single tiny partition by
    construction (at true scale: pre-bucket values to a fixed
    histogram first)."""
    d = _t(spark, sf_dir, "documents")
    g = d.select("source", "n_chars")
    vals = g.select(F.col("n_chars").alias("v")).distinct()
    gcounts = g.groupBy(F.col("n_chars").alias("v")).agg(
        F.count("*").alias("c")
    )
    wg = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    gc = gcounts.select("v", F.sum("c").over(wg).alias("cum_g"))
    srcs = g.groupBy("source").agg(F.count("*").alias("n_s"))
    sv = srcs.crossJoin(F.broadcast(vals))
    scnt = g.groupBy("source", F.col("n_chars").alias("v")).agg(
        F.count("*").alias("c")
    )
    ws = (
        Window.partitionBy("source")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sc = (
        sv.join(scnt, ["source", "v"], "left")
        .select(
            "source",
            "n_s",
            "v",
            F.coalesce(F.col("c"), F.lit(0)).alias("c"),
        )
        .select(
            "source", "n_s", "v", F.sum("c").over(ws).alias("cum_s")
        )
    )
    n = g.agg(F.count("*").alias("n"))
    out = (
        sc.join(F.broadcast(gc), "v")
        .crossJoin(F.broadcast(n))
        .groupBy("source")
        .agg(
            F.max(
                F.abs(
                    F.col("cum_s") * F.col("n")
                    - F.col("cum_g") * F.col("n_s")
                )
            )
            .cast("bigint")
            .alias("d_scaled"),
            F.max("n_s").cast("bigint").alias("n_source"),
            F.max("n").cast("bigint").alias("n_total"),
        )
    )
    return out.orderBy("source")


_BLOCKLIST_ORACLE = """
WITH pat(pat) AS (
  VALUES ('scan'),('an'),('spark'),('park'),('a a'),
         ('table t'),('value'),('ue v'),('sort')
),
m AS (
  SELECT p.pat, d.doc_id, count(*) AS c
  FROM documents d, pat p,
       unnest(range(1, length(d.text) + 1)) t(i)
  WHERE substr(d.text, CAST(i AS INT), length(p.pat)) = p.pat
  GROUP BY 1, 2
)
SELECT p.pat AS pattern,
       CAST(coalesce(count(m.doc_id), 0) AS BIGINT) AS n_docs,
       CAST(coalesce(sum(m.c), 0) AS BIGINT) AS n_matches
FROM pat p LEFT JOIN m ON m.pat = p.pat
GROUP BY 1
ORDER BY pattern
"""


@register_extra("blocklist_match_counts", _BLOCKLIST_ORACLE)
def blocklist_match_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aho-Corasick blocklist scan (operators/multimatch.py) — the
    content-filter primitive (profanity/licence/canary lists) every
    training-data pipeline runs. ALL-occurrence semantics: every end
    position of every pattern counts, overlaps included ('spark' also
    fires 'park' and 'an'; 'a a a' fires 'a a' twice) — exactly what
    the oracle's per-position substr probe counts. Scale shape: the
    DFA (dense goto-or-fail table + cumulative output bitmasks) is
    built ONCE on the driver from the pattern set and rides the task
    closure; the corpus is scanned in a single mapInPandas pass whose
    inner loop is over character positions of the Arrow batch, each
    step one numpy gather across every document at once (the
    vectorize-across-rows trick of sources/pbf.py); per-batch partial
    (pattern, docs, matches) rows are all that shuffle — P rows per
    batch, never the corpus. Per-byte work is O(1) regardless of
    pattern count, which is the whole point of Aho-Corasick vs the
    P-pass regex alternative."""
    import pandas as pd

    import numpy as np

    from ..operators import multimatch

    pats = [
        "scan", "an", "spark", "park", "a a", "table t", "value",
        "ue v", "sort",
    ]
    delta, outmask = multimatch.build_dfa([p.encode("utf-8") for p in pats])
    n_pat = len(pats)

    def _scan(it):
        for pdf in it:
            c = multimatch.count_batch(
                pdf["text"].tolist(), delta, outmask, n_pat
            )
            yield pd.DataFrame(
                {
                    "pid": np.arange(n_pat, dtype=np.int64),
                    "docs": (c > 0).sum(axis=0).astype(np.int64),
                    "matches": c.sum(axis=0).astype(np.int64),
                }
            )

    d = _t(spark, sf_dir, "documents").select("text")
    part = d.mapInPandas(_scan, "pid bigint, docs bigint, matches bigint")
    agg = part.groupBy("pid").agg(
        F.sum("docs").alias("n_docs"), F.sum("matches").alias("n_matches")
    )
    patdf = spark.createDataFrame(
        [(i, p) for i, p in enumerate(pats)], "pid bigint, pattern string"
    )
    return (
        patdf.join(agg, "pid", "left")
        .select(
            "pattern",
            F.coalesce("n_docs", F.lit(0)).cast("long").alias("n_docs"),
            F.coalesce("n_matches", F.lit(0)).cast("long").alias("n_matches"),
        )
        .orderBy("pattern")
    )


@register_extra(
    "sorted_neighborhood_pairs",
    """
    WITH r AS (
      SELECT doc_id, text,
             row_number()
               OVER (ORDER BY lower(substr(text, 1, 32)), doc_id) AS rn
      FROM documents
    ),
    p AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             len(list_intersect(list_distinct(string_split(a.text, ' ')),
                                list_distinct(string_split(b.text, ' '))))
               AS inter,
             len(list_distinct(string_split(a.text, ' ')))
               + len(list_distinct(string_split(b.text, ' ')))
               - len(list_intersect(list_distinct(string_split(a.text, ' ')),
                                    list_distinct(string_split(b.text, ' '))))
               AS uni
      FROM r a JOIN r b ON b.rn > a.rn AND b.rn <= a.rn + 4
    )
    SELECT doc_a, doc_b, CAST(inter AS BIGINT) AS inter_sz,
           CAST(uni AS BIGINT) AS union_sz
    FROM p WHERE 4 * inter >= 3 * uni
    ORDER BY doc_a, doc_b
    """,
)
def sorted_neighborhood_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood-method (SNM) entity resolution — the classic
    third blocking family next to the LSH banding (minhash_dup_pairs)
    and prefix filtering (prefix_filter_jaccard) this repo already
    gates: sort the corpus by a blocking key (lowercased 32-char text
    prefix), slide a fixed window (w=4) down the sorted order, and
    verify only window pairs with exact word-set Jaccard (integer
    cross-multiplied threshold 3/4 — no float anywhere, so the
    candidate->verified pair set itself is hash-gated).

    The scale problem SNM poses on Spark is the GLOBAL rank: a single
    row_number() over the whole corpus is a one-partition window (the
    known anti-pattern). This implementation ranks scalably in two
    passes: (1) a partial-agg count per first-key-byte bucket rides
    back as a broadcast of cumulative offsets (dim-sized: <= alphabet),
    (2) row_number within each bucket's own window partition + offset
    == the exact global rank, because the bucket char is a PREFIX of
    the sort key (order by (bucket, key, id) == order by (key, id)).
    Window pairs then come from a band join on rank blocks of size w
    (each right row probes its own block and the previous one), with
    only (doc_id, rank) crossing that shuffle — text joins back
    doc-keyed for the Jaccard verify, so the corpus never rides the
    candidate-pair exchange."""
    W = 4
    d = _t(spark, sf_dir, "documents")
    key = F.lower(F.substring("text", 1, 32))
    docs = d.select("doc_id", key.alias("k")).withColumn(
        "pfx", F.substring("k", 1, 1)
    )
    counts = docs.groupBy("pfx").agg(F.count("*").alias("cnt"))
    off_w = (
        Window.orderBy("pfx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "pfx", F.coalesce(F.sum("cnt").over(off_w), F.lit(0)).alias("off")
    )
    rn_w = Window.partitionBy("pfx").orderBy("k", "doc_id")
    ranks = (
        docs.join(F.broadcast(offsets), "pfx")
        .select(
            "doc_id",
            (F.col("off") + F.row_number().over(rn_w)).alias("rn"),
        )
    )
    a = ranks.select(
        F.col("doc_id").alias("doc_a"),
        F.col("rn").alias("ra"),
        F.floor((F.col("rn") - 1) / W).alias("blk"),
    )
    bblk = F.floor((F.col("rn") - 1) / W)
    b = ranks.select(
        F.col("doc_id").alias("doc_b"),
        F.col("rn").alias("rb"),
        F.explode(F.array(bblk, bblk - 1)).alias("blk"),
    )
    pairs = (
        a.join(b, "blk")
        .filter((F.col("rb") > F.col("ra")) & (F.col("rb") <= F.col("ra") + W))
        .select("doc_a", "doc_b")
    )
    ta = d.select(F.col("doc_id").alias("doc_a"), F.col("text").alias("ta"))
    tb = d.select(F.col("doc_id").alias("doc_b"), F.col("text").alias("tb"))
    j = pairs.join(ta, "doc_a").join(tb, "doc_b")
    sa = F.array_distinct(F.split("ta", " "))
    sb = F.array_distinct(F.split("tb", " "))
    inter = F.size(F.array_intersect(sa, sb)).cast("bigint")
    uni = (F.size(sa).cast("bigint") + F.size(sb).cast("bigint") - inter)
    return (
        j.select("doc_a", "doc_b", inter.alias("inter_sz"),
                 uni.alias("union_sz"))
        .filter(4 * F.col("inter_sz") >= 3 * F.col("union_sz"))
        .orderBy("doc_a", "doc_b")
    )


@register_extra(
    "posting_list_stats",
    """
    WITH tok AS (
      SELECT doc_id, unnest(list_filter(string_split(text, ' '),
                                        x -> x <> '')) AS term
      FROM documents
    ),
    tf AS (SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
           FROM tok GROUP BY 1, 2),
    n AS (SELECT (count(DISTINCT doc_id) + 9) // 10 AS mindf FROM tf),
    freq AS (
      SELECT term FROM tf CROSS JOIN n
      GROUP BY term, mindf HAVING count(*) >= mindf
    ),
    g AS (
      SELECT t.term, t.tf,
             t.doc_id - COALESCE(lag(t.doc_id) OVER (PARTITION BY t.term
                                                     ORDER BY t.doc_id),
                                 -1) AS gap
      FROM tf t JOIN freq USING (term)
    )
    SELECT term, CAST(count(*) AS BIGINT) AS df,
           CAST(sum(tf) AS BIGINT) AS cf,
           CAST(max(gap) AS BIGINT) AS max_gap,
           CAST(sum(CASE WHEN gap < 128 THEN 1
                         WHEN gap < 16384 THEN 2
                         WHEN gap < 2097152 THEN 3
                         ELSE 4 END) AS BIGINT) AS varint_bytes
    FROM g GROUP BY 1 ORDER BY 1
    """,
)
def posting_list_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index posting-list statistics — the sizing pass a
    search-engine indexer runs before writing segments: per frequent
    term (df >= ceil(n_docs/10), threshold derived in-plan), document
    frequency, collection frequency, the largest doc-id gap, and the
    EXACT byte cost of delta+varint encoding the posting list (gaps
    relative to the previous posting, first posting delta-from--1, so
    every gap >= 1; the 1/2/3/4-byte varint ladder is a CASE — pure
    column algebra, hash-exact). Scale shape: explode -> (term, doc)
    partial agg (map-side combine), one lag window PER TERM over the
    posting order (exactly how index segments are laid out), then a
    term-keyed rollup."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tok = docs.select(
        "doc_id",
        F.explode(
            F.filter(F.split("text", " "), lambda x: x != "")
        ).alias("term"),
    )
    tf = tok.groupBy("term", "doc_id").agg(F.count("*").alias("tf"))
    n = tf.agg(
        F.expr("(count(DISTINCT doc_id) + 9) div 10").alias("mindf")
    )
    freq = (
        tf.crossJoin(F.broadcast(n))
        .groupBy("term", "mindf")
        .agg(F.count("*").alias("_df"))
        .filter(F.col("_df") >= F.col("mindf"))
        .select("term")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("term").orderBy("doc_id")
    g = tf.join(F.broadcast(freq), "term").select(
        "term",
        "tf",
        (
            F.col("doc_id")
            - F.coalesce(F.lag("doc_id").over(w), F.lit(-1))
        ).alias("gap"),
    )
    return (
        g.groupBy("term")
        .agg(
            F.count("*").alias("df"),
            F.sum("tf").alias("cf"),
            F.max("gap").alias("max_gap"),
            F.sum(
                F.when(F.col("gap") < 128, 1)
                .when(F.col("gap") < 16384, 2)
                .when(F.col("gap") < 2097152, 3)
                .otherwise(4)
            ).alias("varint_bytes"),
        )
        .orderBy("term")
    )


@register_extra(
    "emd_source_drift",
    """
    WITH h AS (
      SELECT source, n_chars AS v, CAST(count(*) AS BIGINT) AS c
      FROM documents
      WHERE source IN ('src0', 'src1', 'src2', 'src3', 'src4')
      GROUP BY 1, 2
    ),
    tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM h GROUP BY 1),
    pr AS (
      SELECT a.source AS sa, b.source AS sb
      FROM tot a JOIN tot b ON b.source > a.source
    ),
    grid AS (
      SELECT DISTINCT p.sa, p.sb, h.v
      FROM pr p JOIN h ON h.source = p.sa OR h.source = p.sb
    ),
    cum AS (
      SELECT g.sa, g.sb, g.v,
             sum(COALESCE(ha.c, 0)) OVER w AS cum_a,
             sum(COALESCE(hb.c, 0)) OVER w AS cum_b,
             lead(g.v) OVER w - g.v AS gap
      FROM grid g
      LEFT JOIN h ha ON ha.source = g.sa AND ha.v = g.v
      LEFT JOIN h hb ON hb.source = g.sb AND hb.v = g.v
      WINDOW w AS (PARTITION BY g.sa, g.sb ORDER BY g.v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT c.sa, c.sb, ta.n AS n_a, tb.n AS n_b,
           CAST(sum(abs(c.cum_a * tb.n - c.cum_b * ta.n)
                    * COALESCE(c.gap, 0)) AS BIGINT) AS emd_scaled
    FROM cum c
    JOIN tot ta ON ta.source = c.sa
    JOIN tot tb ON tb.source = c.sb
    GROUP BY 1, 2, 3, 4 ORDER BY 1, 2
    """,
)
def emd_source_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-D earth mover's distance between per-source document-length
    distributions — the integral-form drift metric that complements
    source_ks_drift's max-form: EMD = sum over the value grid of
    |cdf_a - cdf_b| * gap, kept EXACT by scaling both cdfs to the
    common denominator n_a*n_b (the kmeans/moments trick applied to
    distribution distance). Scale shape: the fact table collapses to
    per-source histograms first (map-side combine), pairs and grids
    are histogram-sized, and the cumulative window runs per pair over
    the merged support. All integers, hash-exact."""
    from pyspark.sql import Window

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    srcs = ["src0", "src1", "src2", "src3", "src4"]
    h = (
        docs.filter(F.col("source").isin(srcs))
        .groupBy(F.col("source"), F.col("n_chars").alias("v"))
        .agg(F.count("*").alias("c"))
    )
    tot = h.groupBy("source").agg(F.sum("c").alias("n"))
    pr = (
        tot.select(F.col("source").alias("sa"))
        .crossJoin(tot.select(F.col("source").alias("sb")))
        .filter(F.col("sb") > F.col("sa"))
    )
    grid = (
        pr.join(
            h,
            (h["source"] == pr["sa"]) | (h["source"] == pr["sb"]),
        )
        .select("sa", "sb", "v")
        .distinct()
    )
    ha = h.select(F.col("source").alias("sa"), F.col("v"), F.col("c").alias("ca"))
    hb = h.select(F.col("source").alias("sb"), F.col("v"), F.col("c").alias("cb"))
    g = (
        grid.join(ha, ["sa", "v"], "left")
        .join(hb, ["sb", "v"], "left")
        .select(
            "sa",
            "sb",
            "v",
            F.coalesce("ca", F.lit(0)).alias("ca"),
            F.coalesce("cb", F.lit(0)).alias("cb"),
        )
    )
    w = (
        Window.partitionBy("sa", "sb")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    lw = Window.partitionBy("sa", "sb").orderBy("v")
    cum = g.select(
        "sa",
        "sb",
        F.sum("ca").over(w).alias("cum_a"),
        F.sum("cb").over(w).alias("cum_b"),
        (F.lead("v").over(lw) - F.col("v")).alias("gap"),
    )
    ta = tot.select(F.col("source").alias("sa"), F.col("n").alias("n_a"))
    tb = tot.select(F.col("source").alias("sb"), F.col("n").alias("n_b"))
    return (
        cum.join(F.broadcast(ta), "sa")
        .join(F.broadcast(tb), "sb")
        .groupBy("sa", "sb", "n_a", "n_b")
        .agg(
            F.sum(
                F.abs(
                    F.col("cum_a") * F.col("n_b")
                    - F.col("cum_b") * F.col("n_a")
                )
                * F.coalesce("gap", F.lit(0))
            ).alias("emd_scaled")
        )
        .orderBy("sa", "sb")
    )


@register_extra(
    "lz_match_stats",
    """
    WITH d AS (
      SELECT doc_id, text, length(text) AS n FROM documents
      WHERE doc_id % 5 = 0
    ),
    g AS (
      SELECT doc_id, p.pos, substr(text, CAST(p.pos AS INT), 8) AS gram
      FROM d, LATERAL (SELECT unnest(range(1, n - 6)) AS pos) p
    ),
    m AS (
      SELECT DISTINCT a.doc_id, a.pos
      FROM g a JOIN g b
        ON b.doc_id = a.doc_id AND b.gram = a.gram
       AND b.pos BETWEEN a.pos - 256 AND a.pos - 1
    )
    SELECT d.doc_id, CAST(d.n - 7 AS BIGINT) AS n_positions,
           CAST(COALESCE(count(m.pos), 0) AS BIGINT) AS n_match8,
           CAST(COALESCE(count(m.pos), 0) * 10000
                // (d.n - 7) AS BIGINT) AS match_rate_e4
    FROM d LEFT JOIN m USING (doc_id)
    GROUP BY d.doc_id, d.n ORDER BY d.doc_id
    """,
)
def lz_match_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LZ77-style compressibility probe: for every position of each
    document (1-in-5 sample), does its 8-gram reappear from a match
    within the preceding 256-character window? The match rate is the
    back-reference density an LZ coder would exploit — the text-side
    sibling of the raster RLE probe, and the signal dedup pipelines
    use to spot boilerplate. Scale shape: grams explode JVM-side
    (sequence + substring, no UDF), candidates come from a (doc, gram)
    EQUI-join — the window predicate only filters — so the join never
    leaves the doc's own gram groups; DISTINCT collapses multiple
    earlier matches before the per-doc rollup."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("doc_id") % 5 == 0
    )
    d = docs.select("doc_id", "text", F.length("text").alias("n"))
    g = d.select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.col("n") - 7)).alias("pos"),
        "text",
    ).select(
        "doc_id",
        "pos",
        F.expr("substring(text, CAST(pos AS INT), 8)").alias("gram"),
    )
    b = g.select(
        "doc_id", F.col("pos").alias("pos_b"), F.col("gram")
    )
    m = (
        g.join(b, ["doc_id", "gram"])
        .filter(
            (F.col("pos_b") >= F.col("pos") - 256)
            & (F.col("pos_b") <= F.col("pos") - 1)
        )
        .select("doc_id", "pos")
        .distinct()
    )
    mc = m.groupBy("doc_id").agg(F.count("*").alias("n_match8"))
    return (
        d.join(mc, "doc_id", "left")
        .select(
            "doc_id",
            (F.col("n") - 7).cast("long").alias("n_positions"),
            F.coalesce("n_match8", F.lit(0)).cast("long").alias("n_match8"),
            F.expr(
                "COALESCE(n_match8, 0) * 10000 div (n - 7)"
            ).alias("match_rate_e4"),
        )
        .orderBy("doc_id")
    )


@register_extra(
    "matryoshka_recall",
    """
    WITH comp AS (
      SELECT vec_id, r.i,
             CAST(floor(CAST(embedding[r.i] AS DOUBLE) * 1000) AS BIGINT)
               AS c
      FROM embeddings, range(1, 65) r(i)
    ),
    q AS (SELECT DISTINCT vec_id AS q_id FROM comp WHERE vec_id % 50 = 0),
    d AS (
      SELECT a.vec_id AS q_id, b.vec_id,
             CAST(sum(a.c * b.c) AS BIGINT) AS dfull,
             CAST(sum(CASE WHEN a.i <= 16 THEN a.c * b.c ELSE 0 END)
                  AS BIGINT) AS dtrunc
      FROM comp a JOIN comp b ON b.i = a.i AND b.vec_id <> a.vec_id
      JOIN q ON q.q_id = a.vec_id
      GROUP BY 1, 2
    ),
    rf AS (
      SELECT q_id, vec_id,
             row_number() OVER (PARTITION BY q_id
                                ORDER BY dfull DESC, vec_id) AS rn
      FROM d
    ),
    rt AS (
      SELECT q_id, vec_id,
             row_number() OVER (PARTITION BY q_id
                                ORDER BY dtrunc DESC, vec_id) AS rn
      FROM d
    ),
    t1 AS (
      SELECT f.q_id,
             CASE WHEN f.vec_id = t.vec_id THEN 1 ELSE 0 END AS keep
      FROM rf f JOIN rt t ON t.q_id = f.q_id AND t.rn = 1
      WHERE f.rn = 1
    ),
    o3 AS (
      SELECT f.q_id, count(*) AS ov
      FROM (SELECT q_id, vec_id FROM rf WHERE rn <= 3) f
      JOIN (SELECT q_id, vec_id FROM rt WHERE rn <= 3) t
        ON t.q_id = f.q_id AND t.vec_id = f.vec_id
      GROUP BY 1
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM q) AS n_queries,
           CAST(sum(t1.keep) AS BIGINT) AS top1_preserved,
           CAST((SELECT sum(ov) FROM o3) AS BIGINT) AS top3_overlap,
           CAST(sum(t1.keep) * 10000 // (SELECT count(*) FROM q)
                AS BIGINT) AS recall1_e4
    FROM t1
    """,
)
def matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-truncation retrieval quality: does maximum-inner-
    product top-1/top-3 survive truncating the 64-dim embedding to its
    FIRST 16 dims (the MRL deployment question — serve short prefixes,
    keep full vectors offline)? Components floor-quantize to e-3
    integers BEFORE any arithmetic, so both dot products and both
    rankings are hash-exact (ties -> lowest vec id). Spark computes
    full and truncated dots in ONE zip_with pass (the truncated sum
    reuses the first 16 products via slice), broadcast queries,
    rank windows per query; the oracle re-derives everything from an
    exploded component table."""
    from pyspark.sql import Window

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id",
        F.expr(
            "transform(embedding,"
            " c -> CAST(floor(CAST(c AS DOUBLE) * 1000) AS BIGINT))"
        ).alias("qv"),
    )
    q = e.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("qv").alias("qq")
    )
    j = e.crossJoin(F.broadcast(q)).filter(F.col("vec_id") != F.col("q_id"))
    prods = F.zip_with("qv", "qq", lambda a, b: a * b)
    d = j.select(
        "q_id",
        "vec_id",
        F.aggregate(prods, F.lit(0).cast("long"), lambda acc, v: acc + v).alias(
            "dfull"
        ),
        F.aggregate(
            F.slice(prods, 1, 16), F.lit(0).cast("long"), lambda acc, v: acc + v
        ).alias("dtrunc"),
    )
    wf = Window.partitionBy("q_id").orderBy(F.col("dfull").desc(), "vec_id")
    wt = Window.partitionBy("q_id").orderBy(F.col("dtrunc").desc(), "vec_id")
    r = d.select(
        "q_id",
        "vec_id",
        F.row_number().over(wf).alias("rf"),
        F.row_number().over(wt).alias("rt"),
    )
    t1 = (
        r.filter(F.col("rf") == 1)
        .select("q_id", F.col("vec_id").alias("vf"))
        .join(
            r.filter(F.col("rt") == 1).select(
                "q_id", F.col("vec_id").alias("vt")
            ),
            "q_id",
        )
        .select(
            "q_id",
            F.when(F.col("vf") == F.col("vt"), 1).otherwise(0).alias("keep"),
        )
    )
    o3 = (
        r.filter(F.col("rf") <= 3)
        .select("q_id", "vec_id")
        .join(
            r.filter(F.col("rt") <= 3).select("q_id", "vec_id"),
            ["q_id", "vec_id"],
        )
        .groupBy()
        .agg(F.count("*").alias("top3_overlap"))
    )
    nq = q.groupBy().agg(F.count("*").alias("n_queries"))
    return (
        t1.groupBy()
        .agg(F.sum("keep").alias("top1_preserved"))
        .crossJoin(o3)
        .crossJoin(nq)
        .select(
            "n_queries",
            "top1_preserved",
            "top3_overlap",
            F.expr("top1_preserved * 10000 div n_queries").alias(
                "recall1_e4"
            ),
        )
    )


# --------------------------------------------------- Naive Bayes


@register_extra(
    "naive_bayes_confusion",
    """
    WITH toks AS (
      SELECT doc_id, source, t.tok
      FROM documents, unnest(string_split(text, ' ')) AS t(tok)
      WHERE t.tok != ''
    ),
    tf AS (
      SELECT doc_id, source AS true_source, tok, count(*) AS tf
      FROM toks GROUP BY 1, 2, 3
    ),
    cls AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1),
    nd AS (SELECT count(*) AS n FROM documents),
    cst AS (SELECT source, tok, count(*) AS c FROM toks GROUP BY 1, 2),
    ts AS (SELECT source, count(*) AS t FROM toks GROUP BY 1),
    v AS (SELECT count(DISTINCT tok) AS v FROM toks),
    score AS (
      SELECT tf.doc_id, tf.true_source, cls.source AS cand,
             CAST(sum(CAST(tf.tf * ln(
               (coalesce(cst.c, 0) + 1.0) / (ts.t + v.v)
             ) AS DECIMAL(38,18))) AS DECIMAL(38,18))
             + CAST(ln(CAST(cls.n_docs AS DOUBLE) / nd.n)
                    AS DECIMAL(38,18)) AS lp
      FROM tf
      CROSS JOIN cls CROSS JOIN nd CROSS JOIN v
      JOIN ts ON ts.source = cls.source
      LEFT JOIN cst ON cst.source = cls.source AND cst.tok = tf.tok
      GROUP BY 1, 2, 3, cls.n_docs, nd.n
    ),
    pred AS (
      SELECT doc_id, true_source, cand AS pred_source,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY lp DESC, cand) AS rn
      FROM score
    )
    SELECT true_source, pred_source, count(*) AS n_docs
    FROM pred WHERE rn = 1
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def naive_bayes_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes source classifier, trained and evaluated
    in one job (the classic domain/quality tagger of text-corpus
    pipelines): Laplace-smoothed token likelihoods per source class +
    log prior, argmax over classes (tie -> lexicographically first),
    reported as the true-vs-predicted confusion matrix. Float
    discipline per the bigram-LM precedent: every term is ln() of a
    ratio of integer counts (IEEE-identical on both engines), summed
    in DECIMAL(38,18) so addition order can't perturb the argmax.
    Scale shape: the model (classes x vocab cells + class totals) is
    the broadcastable small side; scoring is one join keyed on token,
    partial-aggregated per (doc, class) — no per-class scan of the
    corpus."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "source",
        F.explode(
            F.filter(F.split("text", " "), lambda x: x != "")
        ).alias("tok"),
    )
    tf = toks.groupBy(
        "doc_id", F.col("source").alias("true_source"), "tok"
    ).agg(F.count("*").alias("tf"))
    cls = d.groupBy("source").agg(F.count("*").alias("n_docs"))
    n_total = d.count()
    cst = toks.groupBy("source", "tok").agg(F.count("*").alias("c"))
    ts = toks.groupBy("source").agg(F.count("*").alias("t"))
    v = toks.select("tok").distinct().count()

    model = (
        cls.join(ts, "source")
        .crossJoin(toks.select("tok").distinct())
        .join(cst, ["source", "tok"], "left")
        .select(
            F.col("source").alias("cand"),
            "tok",
            "n_docs",
            "t",
            F.coalesce("c", F.lit(0)).alias("c"),
        )
    )
    term = (
        F.col("tf")
        * F.log((F.col("c") + F.lit(1.0)) / (F.col("t") + F.lit(float(v))))
    ).cast("decimal(38,18)")
    prior = F.log(
        F.col("n_docs").cast("double") / F.lit(float(n_total))
    ).cast("decimal(38,18)")
    score = (
        tf.join(F.broadcast(model), "tok")
        .groupBy("doc_id", "true_source", "cand")
        .agg(
            (F.sum(term) + F.first(prior)).alias("lp"),
        )
    )
    win = Window.partitionBy("doc_id").orderBy(F.desc("lp"), F.asc("cand"))
    pred = score.withColumn("rn", F.row_number().over(win)).filter(
        F.col("rn") == 1
    )
    return (
        pred.groupBy("true_source", F.col("cand").alias("pred_source"))
        .agg(F.count("*").alias("n_docs"))
        .orderBy("true_source", "pred_source")
    )


# ------------------------------------------------------ BPE merges

def _bpe_pairs_sql(state_cte: str) -> str:
    """Pair-count CTE body over a BPE state relation (word, cnt, st)."""
    return f"""
      SELECT pr[1] AS l, pr[2] AS r, CAST(sum(cnt) AS BIGINT) AS c
      FROM (
        SELECT cnt, unnest(list_zip(sym[1:-2], sym[2:])) AS pr
        FROM (
          SELECT cnt,
                 list_filter(string_split(st, ' '), x -> x <> '') AS sym
          FROM {state_cte}
        )
      )
      GROUP BY 1, 2
    """


def _bpe_merge_sql(prev: str, m: str) -> str:
    """State-advance CTE body: greedy left-to-right merge of m's pair."""
    return f"""
      SELECT word, cnt,
             replace(st,
                     ' ' || (SELECT l FROM {m}) || '  '
                         || (SELECT r FROM {m}) || ' ',
                     ' ' || (SELECT l FROM {m})
                         || (SELECT r FROM {m}) || ' ') AS st
      FROM {prev}
    """


_BPE_ORACLE = f"""
    WITH w AS (
      SELECT t.tok AS word, count(*) AS cnt
      FROM documents, unnest(string_split(text, ' ')) AS t(tok)
      WHERE t.tok <> '' GROUP BY 1
    ),
    s0 AS (
      SELECT word, cnt,
             list_aggregate(
               list_transform(range(1, length(word) + 1),
                              i -> ' ' || substr(word, i, 1) || ' '),
               'string_agg', '') AS st
      FROM w
    ),
    p1 AS ({_bpe_pairs_sql("s0")}),
    m1 AS (SELECT l, r, c FROM p1 ORDER BY c DESC, l, r LIMIT 1),
    s1 AS ({_bpe_merge_sql("s0", "m1")}),
    p2 AS ({_bpe_pairs_sql("s1")}),
    m2 AS (SELECT l, r, c FROM p2 ORDER BY c DESC, l, r LIMIT 1),
    s2 AS ({_bpe_merge_sql("s1", "m2")}),
    p3 AS ({_bpe_pairs_sql("s2")}),
    m3 AS (SELECT l, r, c FROM p3 ORDER BY c DESC, l, r LIMIT 1)
    SELECT 1 AS iter, l AS left_sym, r AS right_sym, c AS pair_count FROM m1
    UNION ALL SELECT 2, l, r, c FROM m2
    UNION ALL SELECT 3, l, r, c FROM m3
    ORDER BY iter
"""


@register_extra("bpe_merge_train", _BPE_ORACLE)
def bpe_merge_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THREE real BPE training iterations (Sennrich et al.) over the
    corpus vocabulary — the actual tokenizer-training inner loop, not
    just pair counting: per iteration, count adjacent symbol pairs
    weighted by word frequency (overlapping adjacencies count, per the
    reference algorithm), pick the argmax (tie -> lexicographic), and
    merge every occurrence greedily left-to-right. Word state is the
    space-wrapped symbol string (' a  b  c '), so a single scan-order
    string replace IS the greedy non-overlapping merge and multi-char
    symbols can never false-match across boundaries. Spark: driver
    loop of 3 count-agg + 1-row collect + replace (the merge table is
    the classic bounded driver artifact — a tokenizer's merge list);
    oracle: the same 3 iterations unrolled as CTE pairs. Scale shape:
    state lives per DISTINCT word (vocab-sized, not corpus-sized);
    each iteration is one partial-agg shuffle over pair keys."""
    d = _t(spark, sf_dir, "documents")
    w = (
        d.select(
            F.explode(
                F.filter(F.split("text", " "), lambda x: x != "")
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )
    st = w.select(
        "word",
        "cnt",
        F.expr(
            "concat_ws('', transform(sequence(1, length(word)),"
            " i -> concat(' ', substring(word, i, 1), ' ')))"
        ).alias("st"),
    )
    merges = []
    for it in range(1, 4):
        sym = F.expr("filter(split(st, ' '), x -> x != '')")
        pairs = (
            st.select("cnt", sym.alias("sym"))
            .filter(F.size("sym") >= 2)
            .select(
                "cnt",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(sym) - 1),"
                        " i -> named_struct('l', element_at(sym, i),"
                        " 'r', element_at(sym, i + 1)))"
                    )
                ).alias("pr"),
            )
            .groupBy(F.col("pr.l").alias("l"), F.col("pr.r").alias("r"))
            .agg(F.sum("cnt").cast("long").alias("c"))
        )
        top = pairs.orderBy(F.desc("c"), F.asc("l"), F.asc("r")).limit(1)
        row = top.collect()[0]  # 1-row merge-table entry (bounded)
        merges.append((it, row["l"], row["r"], int(row["c"])))
        st = st.withColumn(
            "st",
            F.call_function(
                "replace",
                F.col("st"),
                F.lit(f" {row['l']}  {row['r']} "),
                F.lit(f" {row['l']}{row['r']} "),
            ),
        )
    return spark.createDataFrame(
        merges, "iter int, left_sym string, right_sym string, pair_count long"
    ).orderBy("iter")


# ------------------------------------------------- edit distance


@register_extra(
    "edit_distance_blocked",
    """
    WITH d AS (
      SELECT doc_id, lang, text, n_chars, n_chars // 16 AS bk
      FROM documents
      WHERE strlen(text) = length(text)  -- ASCII only: engines
        -- disagree on the multibyte edit unit (bytes vs chars)
    ),
    pairs AS (
      SELECT a.lang, levenshtein(a.text, b.text) AS dist,
             greatest(a.n_chars, b.n_chars) AS mx
      FROM d a
      JOIN d b
        ON a.lang = b.lang AND a.bk = b.bk AND a.doc_id < b.doc_id
    )
    SELECT lang,
           count(*) AS n_pairs,
           CAST(min(dist) AS BIGINT) AS min_dist,
           CAST(sum(dist) AS BIGINT) AS sum_dist,
           count(*) FILTER (WHERE 5 * dist <= mx) AS n_near
    FROM pairs GROUP BY 1 ORDER BY lang
    """,
)
def edit_distance_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Levenshtein verification of blocked candidate pairs — the
    refine stage a near-dup pipeline runs AFTER cheap blocking: block
    on (lang, length//16) so only plausibly-similar docs pair (the
    sorted-neighborhood principle: edit distance >= length difference,
    so cross-bucket pairs can't be near), then compute exact edit
    distance engine-native (unit costs; restricted to ASCII docs where
    Spark's char-based and DuckDB's byte-based units coincide — see
    the inline filters). Per lang: candidate count, min/sum distance, and
    pairs within 20% of the longer text (5*dist <= max_len, integer
    form). Scale shape: blocking bounds the quadratic refine to
    within-bucket pairs — the all-pairs O(n^2) never materializes."""
    d = (
        _t(spark, sf_dir, "documents")
        # ASCII-only (byte length == char length): Spark levenshtein
        # counts chars, DuckDB counts bytes — they agree only there
        .filter(F.octet_length("text") == F.length("text"))
        .select(
            "doc_id",
            "lang",
            "text",
            "n_chars",
            F.expr("n_chars div 16").alias("bk"),
        )
    )
    a = d.select(
        F.col("doc_id").alias("ida"), "lang", "bk",
        F.col("text").alias("ta"), F.col("n_chars").alias("na"),
    )
    b = d.select(
        F.col("doc_id").alias("idb"), "lang", "bk",
        F.col("text").alias("tb"), F.col("n_chars").alias("nb"),
    )
    pairs = a.join(b, ["lang", "bk"]).filter(
        F.col("ida") < F.col("idb")
    ).select(
        "lang",
        F.levenshtein("ta", "tb").alias("dist"),
        F.greatest("na", "nb").alias("mx"),
    )
    return (
        pairs.groupBy("lang")
        .agg(
            F.count("*").alias("n_pairs"),
            F.min("dist").cast("long").alias("min_dist"),
            F.sum("dist").cast("long").alias("sum_dist"),
            F.count(F.when(5 * F.col("dist") <= F.col("mx"), 1)).alias(
                "n_near"
            ),
        )
        .orderBy("lang")
    )


# --------------------------------------------------- n-gram novelty


@register_extra(
    "ngram_novelty_scores",
    """
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), x -> x <> '') AS t
      FROM documents
    ),
    tri AS (
      SELECT DISTINCT doc_id,
             tz[1] || ' ' || tz[2] || ' ' || tz[3] AS g
      FROM (
        SELECT doc_id,
               unnest(list_zip(t[1:-3], t[2:-2], t[3:])) AS tz
        FROM toks
      )
    ),
    first_seen AS (
      SELECT g, min(doc_id) AS first_doc FROM tri GROUP BY 1
    )
    SELECT tri.doc_id,
           count(*) AS n_tri,
           count(*) FILTER (WHERE first_seen.first_doc = tri.doc_id)
             AS n_novel
    FROM tri JOIN first_seen USING (g)
    GROUP BY 1 ORDER BY doc_id
    """,
)
def ngram_novelty_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal n-gram novelty — the curation signal that separates
    fresh content from recombinations: for each doc (in doc_id order,
    the ingestion order), how many of its distinct word trigrams have
    never appeared in ANY earlier document. Computed set-wide: one
    distinct-trigram explode, one min(doc_id) aggregation (the global
    first-seen index), one join back — the same first-occurrence
    dataflow a dedup-aware crawler uses to prioritize novel pages.
    Scale shape: everything keys on the trigram hash; partial-agg
    min() makes first-seen a single shuffle, and no doc ever compares
    against another doc directly."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.filter(F.split("text", " "), lambda x: x != "").alias("t"),
    ).filter(F.size("t") >= 3)
    tri = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(t) - 2),"
                " i -> concat_ws(' ', element_at(t, i),"
                " element_at(t, i + 1), element_at(t, i + 2)))"
            )
        ).alias("g"),
    ).distinct()
    first_seen = tri.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    return (
        tri.join(first_seen, "g")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tri"),
            F.count(
                F.when(F.col("first_doc") == F.col("doc_id"), 1)
            ).alias("n_novel"),
        )
        .orderBy("doc_id")
    )


# ------------------------------------------------ JL projection

# deterministic +/-1 projection matrix (8 x 64), generated once from
# md5 at import; embedded verbatim in BOTH the oracle SQL and the
# Spark literal so neither engine needs to hash
import hashlib as _hl

_JL_K = 8
_JL_SIGNS = [
    [
        1 if int(_hl.md5(f"jl{j}:{d}".encode()).hexdigest()[:1], 16) % 2 == 0
        else -1
        for d in range(64)
    ]
    for j in range(_JL_K)
]


def _jl_oracle() -> str:
    vals = ", ".join(
        f"({j}, {d + 1}, {_JL_SIGNS[j][d]})"
        for j in range(_JL_K)
        for d in range(64)
    )
    return f"""
    WITH comp AS (
      SELECT vec_id, r.i,
             CAST(floor(CAST(embedding[r.i] AS DOUBLE) * 1000) AS BIGINT)
               AS c
      FROM embeddings, range(1, 65) r(i)
    ),
    signs(j, i, r) AS (VALUES {vals}),
    proj AS (
      SELECT comp.vec_id, signs.j,
             CAST(sum(signs.r * comp.c) AS BIGINT) AS p
      FROM comp JOIN signs USING (i)
      GROUP BY 1, 2
    ),
    dfull AS (
      SELECT a.vec_id,
             CAST(sum((a.c - b.c) * (a.c - b.c)) AS BIGINT) AS d2_full
      FROM comp a JOIN comp b
        ON b.vec_id = a.vec_id + 1 AND b.i = a.i
      GROUP BY 1
    ),
    dproj AS (
      SELECT a.vec_id,
             CAST(sum((a.p - b.p) * (a.p - b.p)) AS BIGINT) AS d2_proj
      FROM proj a JOIN proj b
        ON b.vec_id = a.vec_id + 1 AND b.j = a.j
      GROUP BY 1
    )
    SELECT dfull.vec_id, dfull.d2_full, dproj.d2_proj,
           CAST((1000000 * dproj.d2_proj) // ({_JL_K} * dfull.d2_full)
             AS BIGINT) AS ratio_e6
    FROM dfull JOIN dproj USING (vec_id)
    ORDER BY vec_id
    """


@register_extra("jl_projection_audit", _jl_oracle())
def jl_projection_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss distance-preservation audit: project the
    e-3-quantized 64-dim embeddings onto 8 fixed +/-1 hyperplanes (the
    Achlioptas database-friendly JL construction; the sign matrix is a
    deterministic constant embedded in both engines) and compare each
    consecutive-pair squared distance in projected space against k
    times the full-space distance — ratio_e6 ~ 1e6 is the JL promise;
    its spread IS the distortion a dimensionality-reduction rollout
    must measure before swapping its ANN index to the sketch. Exact
    integers end to end. Scale shape: projections are one zip_with
    pass per vector (map-side, no shuffle); the pair join is keyed on
    vec_id+1."""
    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr(
            "transform(embedding,"
            " x -> cast(floor(cast(x as double) * 1000) as long))"
        ).alias("qv"),
    )
    signs = F.array(
        *[
            F.array(*[F.lit(s) for s in _JL_SIGNS[j]])
            for j in range(_JL_K)
        ]
    )
    withp = e.select(
        "vec_id",
        "qv",
        F.transform(
            signs,
            lambda row: F.aggregate(
                F.zip_with("qv", row, lambda a, b: a * b),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            ),
        ).alias("p"),
    )
    a = withp.select("vec_id", F.col("qv").alias("qa"), F.col("p").alias("pa"))
    b = withp.select(
        (F.col("vec_id") - 1).alias("vec_id"),
        F.col("qv").alias("qb"),
        F.col("p").alias("pb"),
    )
    pairs = a.join(b, "vec_id")
    d2f = F.aggregate(
        F.zip_with("qa", "qb", lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    d2p = F.aggregate(
        F.zip_with("pa", "pb", lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    return (
        pairs.select(
            "vec_id", d2f.alias("d2_full"), d2p.alias("d2_proj")
        )
        .select(
            "vec_id",
            "d2_full",
            "d2_proj",
            F.expr(f"(1000000 * d2_proj) div ({_JL_K} * d2_full)").alias(
                "ratio_e6"
            ),
        )
        .orderBy("vec_id")
    )


# ------------------------------------------- greedy max coverage

_GMC_K = 5


def _gmc_oracle() -> str:
    """k unrolled greedy levels: each picks the doc with the largest
    count of trigrams not yet covered (tie -> smallest doc_id)."""
    lvl = []
    for i in range(1, _GMC_K + 1):
        prev_cov = (
            "SELECT g FROM tri WHERE false"
            if i == 1
            else " UNION ".join(
                f"SELECT g FROM tri WHERE doc_id = (SELECT doc_id FROM p{t})"
                for t in range(1, i)
            )
        )
        lvl.append(f"""
    cov{i - 1} AS ({prev_cov}),
    g{i} AS (
      SELECT t.doc_id, count(*) AS gain
      FROM tri t
      WHERE t.g NOT IN (SELECT g FROM cov{i - 1})
      GROUP BY 1
    ),
    p{i} AS (
      SELECT d.doc_id, coalesce(g{i}.gain, 0) AS gain
      FROM (SELECT DISTINCT doc_id FROM tri) d
      LEFT JOIN g{i} USING (doc_id)
      ORDER BY gain DESC, doc_id LIMIT 1
    )""")
    sel = " UNION ALL ".join(
        f"SELECT {i} AS iter, doc_id, CAST(gain AS BIGINT) AS gain FROM p{i}"
        for i in range(1, _GMC_K + 1)
    )
    return f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), x -> x <> '') AS t
      FROM documents
    ),
    tri AS MATERIALIZED (
      SELECT DISTINCT doc_id,
             tz[1] || ' ' || tz[2] || ' ' || tz[3] AS g
      FROM (
        SELECT doc_id,
               unnest(list_zip(t[1:-3], t[2:-2], t[3:])) AS tz
        FROM toks
      )
    ),
    {",".join(lvl)}
    SELECT * FROM ({sel}) ORDER BY iter
    """


@register_extra("greedy_max_coverage", _gmc_oracle())
def greedy_max_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy maximum-coverage data selection — the (1 - 1/e)-optimal
    submodular algorithm behind coreset picking and diverse
    training-data selection: iteratively pick the document covering
    the most word trigrams not yet covered (tie -> smallest doc_id),
    k = 5 rounds. Spark runs the canonical distributed shape: per
    round one anti-join against the covered set + one count-agg +
    a 1-row argmax collect (the selection list is the bounded driver
    artifact, like a tokenizer's merge table); the oracle unrolls the
    same rounds as CTEs. Exact integers."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.filter(F.split("text", " "), lambda x: x != "").alias("t"),
    ).filter(F.size("t") >= 3)
    tri = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(t) - 2),"
                " i -> concat_ws(' ', element_at(t, i),"
                " element_at(t, i + 1), element_at(t, i + 2)))"
            )
        ).alias("g"),
    ).distinct()
    tri = tri.localCheckpoint()  # reused k times; cut the lineage once
    all_docs = tri.select("doc_id").distinct()
    covered = None
    picks = []
    for it in range(1, _GMC_K + 1):
        cand = tri if covered is None else tri.join(
            covered, "g", "left_anti"
        )
        gains = cand.groupBy("doc_id").agg(F.count("*").alias("gain"))
        full = all_docs.join(gains, "doc_id", "left").select(
            "doc_id", F.coalesce("gain", F.lit(0)).alias("gain")
        )
        row = full.orderBy(F.desc("gain"), F.asc("doc_id")).limit(1).collect()[
            0
        ]  # 1-row argmax per round (bounded)
        picks.append((it, int(row["doc_id"]), int(row["gain"])))
        newly = tri.filter(F.col("doc_id") == row["doc_id"]).select("g")
        covered = newly if covered is None else covered.union(newly).distinct()
    return spark.createDataFrame(
        picks, "iter int, doc_id long, gain long"
    ).orderBy("iter")


@register_extra(
    "word_dropout_augment",
    """
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, ' +'), x -> x <> '')
               AS toks
      FROM documents
    ),
    pos AS (
      SELECT doc_id, toks, unnest(range(1, len(toks) + 1)) AS i FROM t
    ),
    k AS (
      SELECT doc_id, i, toks[CAST(i AS INT)] AS tok,
             ('0x' || substr(md5(doc_id || ':' || i || ':' ||
                                 toks[CAST(i AS INT)]), 1, 4))::INT % 4
               AS b
      FROM pos
    ),
    agg AS (
      SELECT doc_id,
             count(*) AS n_tokens,
             count(*) FILTER (b <> 0) AS n_kept,
             coalesce(string_agg(tok, ' ' ORDER BY i) FILTER (b <> 0), '')
               AS aug_text
      FROM k GROUP BY doc_id
    )
    SELECT d.doc_id, CAST(coalesce(a.n_tokens, 0) AS INT) AS n_tokens,
           CAST(coalesce(a.n_kept, 0) AS INT) AS n_kept,
           coalesce(a.aug_text, '') AS aug_text
    FROM documents d LEFT JOIN agg a USING (doc_id) ORDER BY doc_id
    """,
)
def word_dropout_augment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic word-dropout augmentation (the text-side analogue
    of image augmentation in a training-data pipeline): token i of a
    document survives iff md5(doc_id:i:token) % 4 != 0, i.e. a
    reproducible ~25% dropout keyed on (doc, position, token) — reruns
    and retries produce byte-identical augmented text, which is what
    makes augmented corpora cacheable and dedup-safe. Whole plan is a
    single zero-shuffle JVM projection: split -> index-aware
    higher-order filter -> array_join, no explode, no Python — at
    100 TB this runs at scan speed with nothing on the wire."""
    d = _t(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.col("text"), " +"), lambda x: x != F.lit("")
    )
    kept = F.filter(
        F.col("toks"),
        lambda x, i: (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            ":", F.col("doc_id"), i + F.lit(1), x
                        ).cast("binary")
                    ),
                    1,
                    4,
                ),
                16,
                10,
            ).cast("int")
            % 4
        )
        != F.lit(0),
    )
    return (
        d.select("doc_id", toks.alias("toks"))
        .select(
            "doc_id",
            F.size("toks").alias("n_tokens"),
            kept.alias("kept"),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.size("kept").alias("n_kept"),
            F.array_join(F.col("kept"), " ").alias("aug_text"),
        )
        .orderBy("doc_id")
    )


def _kappa_oracle() -> str:
    """Cohen's kappa between the trigram lang-ID heuristic and the
    labeled `lang` column, kept exact: kappa = (N*agree - pe_num) /
    (N^2 - pe_num) where pe_num = sum over classes of rowtotal *
    coltotal — emitted as integer numerator/denominator plus a
    truncated ppm (Spark `div` and DuckDB `//` both truncate toward
    zero, so the negative-kappa case hashes identically)."""
    return f"""
    WITH pred AS ({_lang_id_oracle()}),
    j AS (SELECT p.doc_id, p.lang_pred, d.lang AS lang_true
          FROM pred p JOIN documents d USING (doc_id)),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(CASE WHEN lang_pred = lang_true
                          THEN 1 ELSE 0 END) AS BIGINT) AS agree
          FROM j),
    rc AS (SELECT CAST(r.c * t.c AS BIGINT) AS prod
           FROM (SELECT lang_pred AS cls, count(*) AS c
                 FROM j GROUP BY 1) r
           JOIN (SELECT lang_true AS cls, count(*) AS c
                 FROM j GROUP BY 1) t USING (cls)),
    pe AS (SELECT CAST(coalesce(sum(prod), 0) AS BIGINT) AS pe_num
           FROM rc)
    SELECT n.n AS n_docs, n.agree AS n_agree,
           CAST(n.n * n.agree - pe.pe_num AS BIGINT) AS kappa_num,
           CAST(n.n * n.n - pe.pe_num AS BIGINT) AS kappa_den,
           CAST((1000000 * (n.n * n.agree - pe.pe_num))
                // (n.n * n.n - pe.pe_num) AS BIGINT) AS kappa_ppm
    FROM n, pe
    """


@register_extra("cohens_kappa_audit", _kappa_oracle())
def cohens_kappa_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-annotator agreement: Cohen's kappa between the lang-ID
    heuristic (annotator A) and the corpus `lang` label (annotator B)
    — the standard chance-corrected statistic for auditing weak
    labelers / silver annotations before they feed training data. On
    the synthetic word-salad corpus the heuristic is near chance, so
    kappa ~ 0 (slightly negative) — exactly the signal the audit
    exists to raise. Exact integers end-to-end: agreement and marginal
    products stay BIGINT, the ppm is a truncating integer division
    (identical semantics both engines). Scale shape: one map-side
    scored scan, then class-marginal aggregates over a handful of
    rows; nothing wide ever shuffles."""
    from ..operators.textops import lang_id_ngram

    d = _t(spark, sf_dir, "documents")
    j = (
        lang_id_ngram(d)
        .select("doc_id", "lang_pred")
        .join(d.select("doc_id", F.col("lang").alias("lang_true")), "doc_id")
    )
    n = j.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(
            F.when(F.col("lang_pred") == F.col("lang_true"), 1).otherwise(0)
        )
        .cast("long")
        .alias("agree"),
    )
    r = j.groupBy(F.col("lang_pred").alias("cls")).agg(
        F.count("*").alias("rc")
    )
    t = j.groupBy(F.col("lang_true").alias("cls")).agg(
        F.count("*").alias("tc")
    )
    pe = (
        r.join(t, "cls")
        .agg(
            F.coalesce(F.sum(F.col("rc") * F.col("tc")), F.lit(0))
            .cast("long")
            .alias("pe_num")
        )
    )
    return (
        n.crossJoin(pe)
        .select(
            F.col("n").alias("n_docs"),
            F.col("agree").alias("n_agree"),
            (F.col("n") * F.col("agree") - F.col("pe_num"))
            .cast("long")
            .alias("kappa_num"),
            (F.col("n") * F.col("n") - F.col("pe_num"))
            .cast("long")
            .alias("kappa_den"),
            F.expr(
                "CAST((1000000 * (n * agree - pe_num))"
                " div (n * n - pe_num) AS BIGINT)"
            ).alias("kappa_ppm"),
        )
    )


# --------------------------------------------- phrase query eval

_PHRASES = [("table part", "table", "part"), ("a a", "a", "a"),
            ("fast merge", "fast", "merge")]


@register_extra(
    "phrase_query_postings",
    """
    WITH ph(phrase, w1, w2) AS (VALUES
      ('table part', 'table', 'part'),
      ('a a', 'a', 'a'),
      ('fast merge', 'fast', 'merge')),
    tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    cnt AS (
      SELECT p.phrase, k.doc_id,
             len(list_filter(range(1, len(k.t)), i ->
               k.t[i] = p.w1 AND k.t[i + 1] = p.w2)) AS n_occ
      FROM tok k CROSS JOIN ph p
    )
    SELECT phrase, doc_id, CAST(n_occ AS BIGINT) AS n_occ
    FROM cnt WHERE n_occ > 0 ORDER BY phrase, doc_id
    """,
)
def phrase_query_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phrase-query evaluation the INVERTED-INDEX way: build positional
    postings (doc, term, pos) and answer "w1 w2" with a postings
    self-join on pos2 = pos1 + 1 — exactly how Lucene/ES evaluate
    phrase queries, and the shape that scales (postings are
    term-partitioned; the join touches only the two query terms'
    lists, never the corpus). The oracle never builds an index: it
    scans each document's token array and counts adjacent pairs
    directly — retrieval structure vs definition. Includes the
    self-adjacent phrase 'a a' so overlapping occurrences ('a a a' =
    2) must be handled identically by both. Output: every (phrase,
    doc) with at least one hit and its exact occurrence count."""
    docs = _t(spark, sf_dir, "documents")
    post = docs.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("pos", "term"),
    )
    ph = spark.createDataFrame(_PHRASES, ["phrase", "w1", "w2"])
    p1 = post.join(F.broadcast(ph), post["term"] == ph["w1"]).select(
        "phrase", "w2", "doc_id", F.col("pos").alias("p1")
    )
    p2 = post.select(
        F.col("doc_id").alias("doc_id2"),
        F.col("term").alias("term2"),
        F.col("pos").alias("p2"),
    )
    hits = p1.join(
        p2,
        (p1["doc_id"] == p2["doc_id2"])
        & (p1["w2"] == p2["term2"])
        & (p2["p2"] == p1["p1"] + 1),
    )
    return (
        hits.groupBy("phrase", "doc_id")
        .agg(F.count("*").cast("long").alias("n_occ"))
        .orderBy("phrase", "doc_id")
    )


# --------------------------------------------- feature hashing


@register_extra(
    "feature_hashing_audit",
    """
    WITH tok AS (
      SELECT unnest(string_split(text, ' ')) AS term FROM documents
    ),
    tf AS (SELECT term, count(*) AS c FROM tok WHERE term <> ''
           GROUP BY term),
    bits(nbits) AS (VALUES (4), (6)),
    hashed AS (
      SELECT nbits, term, c,
             ('0x' || substr(md5('fh:' || term), 1, 8))::BIGINT
               % (1 << nbits) AS bucket,
             CASE WHEN ('0x' || substr(md5('fhs:' || term), 1, 4))::INT
                       % 2 = 0 THEN 1 ELSE -1 END AS sgn
      FROM tf CROSS JOIN bits
    )
    SELECT nbits, bucket, CAST(count(*) AS BIGINT) AS n_terms,
           CAST(sum(sgn * c) AS BIGINT) AS signed_sum,
           CAST(sum(c) AS BIGINT) AS abs_mass
    FROM hashed GROUP BY 1, 2 ORDER BY nbits, bucket
    """,
)
def feature_hashing_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick (Weinberger feature hashing) audited at two
    table sizes: corpus term frequencies are hashed into 2^4 and 2^6
    buckets with a +/-1 sign hash, and the audit reports per-bucket
    term collisions, the SIGNED mass a linear model would actually see
    (sign hashing makes collisions cancel in expectation — visible
    here as |signed_sum| < abs_mass exactly where n_terms > 1), and
    the raw mass. This is the audit you run before committing to a
    hashed feature space for a 100 TB training run. Exact integers;
    term frequencies are one map-side-combining groupBy, the hash fan
    is a 2-row broadcast cross join."""
    docs = _t(spark, sf_dir, "documents")
    tf = (
        docs.select(F.explode(F.split("text", " ")).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count("*").alias("c"))
    )
    bits = spark.createDataFrame([(4,), (6,)], ["nbits"])

    def _h(prefix: str, chars: int) -> F.Column:
        return F.conv(
            F.substring(
                F.md5(F.concat(F.lit(prefix), F.col("term")).cast("binary")),
                1,
                chars,
            ),
            16,
            10,
        ).cast("long")

    hashed = tf.crossJoin(F.broadcast(bits)).select(
        "nbits",
        "c",
        F.pmod(_h("fh:", 8), F.expr("shiftleft(1L, nbits)")).alias("bucket"),
        F.when(_h("fhs:", 4).cast("int") % 2 == 0, 1)
        .otherwise(-1)
        .alias("sgn"),
    )
    return (
        hashed.groupBy("nbits", "bucket")
        .agg(
            F.count("*").cast("long").alias("n_terms"),
            F.sum(F.col("sgn") * F.col("c")).cast("long").alias("signed_sum"),
            F.sum("c").cast("long").alias("abs_mass"),
        )
        .orderBy("nbits", "bucket")
    )


# --------------------------------------------- k-center coreset

_KC_K = 8


def _kc_d2(x: str, y: str) -> str:
    return (
        f"list_reduce(list_transform(range(1, 65), i ->"
        f" ({x}[i] - {y}[i]) * ({x}[i] - {y}[i])), (a, b) -> a + b)"
    )


def _kc_oracle() -> str:
    parts = [
        "WITH e AS MATERIALIZED (SELECT vec_id,"
        " CAST(embedding AS DOUBLE[]) AS v FROM embeddings),",
        "c0 AS MATERIALIZED (SELECT v FROM e WHERE vec_id = 0),",
        f"d0 AS MATERIALIZED (SELECT e.vec_id, {_kc_d2('e.v', 'c0.v')}"
        " AS mind FROM e, c0),",
    ]
    sels = ["SELECT 0 AS step, CAST(0 AS BIGINT) AS vec_id,"
            " CAST(0.0 AS DOUBLE) AS radius2"]
    for i in range(1, _KC_K):
        parts.append(
            f"s{i} AS MATERIALIZED (SELECT vec_id, mind FROM d{i-1}"
            " ORDER BY mind DESC, vec_id LIMIT 1),"
        )
        parts.append(
            f"c{i} AS MATERIALIZED (SELECT e.v FROM e, s{i}"
            f" WHERE e.vec_id = s{i}.vec_id),"
        )
        if i < _KC_K - 1:
            parts.append(
                f"d{i} AS MATERIALIZED (SELECT d.vec_id,"
                f" least(d.mind, {_kc_d2('e.v', f'c{i}.v')}) AS mind"
                f" FROM d{i-1} d JOIN e USING (vec_id), c{i}),"
            )
        sels.append(
            f"SELECT {i}, vec_id, CAST(round(mind, 4) AS DOUBLE)"
            f" FROM s{i}"
        )
    sql = "\n".join(parts).rstrip(",")
    return sql + "\n" + " UNION ALL ".join(sels) + " ORDER BY step"


@register_extra("kcenter_coreset", _kc_oracle())
def kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center (farthest-point) coreset selection over the
    embedding table — the 2-approximation that powers diversity-aware
    training-data selection and active-learning seed picking: start
    from vector 0, then repeatedly take the point FARTHEST from the
    chosen set (its distance is the coverage radius, reported per
    step, monotonically shrinking). Spark keeps the whole loop
    distributed: the only state is a (vec_id, min-dist) table, each of
    the 7 rounds is one 1-row broadcast cross join + least() update +
    top-1 pick — no driver-side vectors at all; the oracle unrolls the
    same greedy levels as materialized CTEs. Distances are in-order
    double folds (zip_with/aggregate vs list_reduce, both fold
    left-to-right from 0.0) so the argmax compares bit-identical
    doubles; radii rounded to 4 dp only for display."""
    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).localCheckpoint(eager=True)

    def d2(x, y):
        return F.aggregate(
            F.zip_with(x, y, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, t: acc + t,
        )

    c = e.filter(F.col("vec_id") == 0).select(F.col("v").alias("cv"))
    mind = e.crossJoin(F.broadcast(c)).select(
        "vec_id", "v", d2(F.col("v"), F.col("cv")).alias("mind")
    ).localCheckpoint(eager=True)
    sels = [
        spark.createDataFrame([(0, 0, 0.0)], "step int, vec_id long, radius2 double")
    ]
    for i in range(1, _KC_K):
        top = (
            mind.orderBy(F.col("mind").desc(), "vec_id")
            .limit(1)
            .localCheckpoint(eager=True)
        )
        sels.append(
            top.select(
                F.lit(i).alias("step"),
                F.col("vec_id").cast("long").alias("vec_id"),
                F.round("mind", 4).cast("double").alias("radius2"),
            )
        )
        if i < _KC_K - 1:
            cv = top.select(F.col("v").alias("cv"))
            mind = mind.crossJoin(F.broadcast(cv)).select(
                "vec_id",
                "v",
                F.least("mind", d2(F.col("v"), F.col("cv"))).alias("mind"),
            ).localCheckpoint(eager=True)
    out = sels[0]
    for s in sels[1:]:
        out = out.unionByName(s)
    return out.orderBy("step")


# --------------------------------------------- URL canonicalization

_URL_RAW_SQL = """
    (CASE WHEN ('0x' || substr(md5('us:' || event_id), 1, 2))::INT % 2 = 0
          THEN 'http' ELSE 'https' END)
    || '://'
    || (CASE WHEN ('0x' || substr(md5('uw:' || event_id), 1, 2))::INT % 2 = 0
             THEN 'www.' ELSE '' END)
    || (CASE WHEN ('0x' || substr(md5('uc:' || event_id), 1, 2))::INT % 3 = 0
             THEN 'Site' ELSE 'site' END)
    || CAST(('0x' || substr(md5('uh:' || event_id), 1, 4))::INT % 20
            AS VARCHAR)
    || '.com/p/'
    || CAST(('0x' || substr(md5('up:' || event_id), 1, 4))::INT % 50
            AS VARCHAR)
    || (CASE WHEN ('0x' || substr(md5('ut:' || event_id), 1, 2))::INT % 2 = 0
             THEN '/' ELSE '' END)
    || '?'
    || (CASE WHEN ('0x' || substr(md5('uo:' || event_id), 1, 2))::INT % 2 = 0
         THEN 'a=' || CAST(('0x' || substr(md5('ua:' || event_id),
                                           1, 2))::INT % 5 AS VARCHAR)
           || '&b=' || CAST(('0x' || substr(md5('ub:' || event_id),
                                            1, 2))::INT % 5 AS VARCHAR)
         ELSE 'b=' || CAST(('0x' || substr(md5('ub:' || event_id),
                                           1, 2))::INT % 5 AS VARCHAR)
           || '&a=' || CAST(('0x' || substr(md5('ua:' || event_id),
                                            1, 2))::INT % 5 AS VARCHAR)
        END)
    || (CASE WHEN ('0x' || substr(md5('uu:' || event_id), 1, 2))::INT % 3 = 0
             THEN '&utm_source=x' ELSE '' END)
    || (CASE WHEN ('0x' || substr(md5('uf:' || event_id), 1, 2))::INT % 4 = 0
             THEN '#frag' ELSE '' END)
"""


@register_extra(
    "url_canonical_dedup",
    f"""
    WITH raw AS (
      SELECT event_id, {_URL_RAW_SQL} AS url
      FROM events WHERE event_id % 9 = 0
    ),
    parts AS (
      SELECT event_id,
             string_split(string_split(url, '#')[1], '?')[1] AS base,
             string_split(string_split(url, '#')[1], '?')[2] AS qs
      FROM raw
    ),
    canon AS (
      SELECT event_id,
        rtrim(replace(lower(base), '://www.', '://'), '/')
        || '?' || array_to_string(list_sort(
             list_filter(string_split(qs, '&'),
                         p -> NOT starts_with(p, 'utm'))), '&') AS curl
      FROM parts
    )
    SELECT curl, CAST(count(*) AS BIGINT) AS n_dups,
           CAST(min(event_id) AS BIGINT) AS min_event,
           CAST(max(event_id) AS BIGINT) AS max_event
    FROM canon GROUP BY 1 HAVING count(*) >= 2 ORDER BY curl
    """,
)
def url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + duplicate grouping — the first dedup
    pass of every web-crawl corpus pipeline: strip fragments, drop
    tracking params (utm*), sort the remaining query params, lowercase
    the authority, fold www., strip trailing slashes, THEN group. The
    messy URLs are md5-synthesized with every canonical-equivalence
    channel present (scheme case stays significant; param order, www,
    case, trailing slash, utm, fragment do not). Both engines build
    the identical raw strings, then canonicalize with their OWN string
    machinery (split/array_sort/array_join vs string_split/list_sort/
    array_to_string) — so the gate checks the normalization semantics,
    not shared code. Output: every canonical URL hit >= 2 times with
    its count and event range. Scale: pure per-row string expressions
    + one groupBy on the canonical key — map-side combinable."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") % 9 == 0)
    eid = F.col("event_id").cast("string")

    def _h(prefix: str, chars: int) -> F.Column:
        return F.conv(
            F.substring(
                F.md5(F.concat(F.lit(prefix), eid).cast("binary")), 1, chars
            ),
            16,
            10,
        ).cast("long")

    def _b(prefix: str, mod: int) -> F.Column:
        return (_h(prefix, 2) % mod).cast("int")

    a = F.concat(F.lit("a="), (_b("ua:", 5)).cast("string"))
    b = F.concat(F.lit("b="), (_b("ub:", 5)).cast("string"))
    url = F.concat(
        F.when(_b("us:", 2) == 0, F.lit("http")).otherwise(F.lit("https")),
        F.lit("://"),
        F.when(_b("uw:", 2) == 0, F.lit("www.")).otherwise(F.lit("")),
        F.when(_b("uc:", 3) == 0, F.lit("Site")).otherwise(F.lit("site")),
        (_h("uh:", 4).cast("int") % 20).cast("string"),
        F.lit(".com/p/"),
        (_h("up:", 4).cast("int") % 50).cast("string"),
        F.when(_b("ut:", 2) == 0, F.lit("/")).otherwise(F.lit("")),
        F.lit("?"),
        F.when(_b("uo:", 2) == 0, F.concat(a, F.lit("&"), b)).otherwise(
            F.concat(b, F.lit("&"), a)
        ),
        F.when(_b("uu:", 3) == 0, F.lit("&utm_source=x")).otherwise(
            F.lit("")
        ),
        F.when(_b("uf:", 4) == 0, F.lit("#frag")).otherwise(F.lit("")),
    )
    parts = ev.select(
        "event_id",
        F.element_at(
            F.split(F.element_at(F.split(url, "#"), 1), "\\?"), 1
        ).alias("base"),
        F.element_at(
            F.split(F.element_at(F.split(url, "#"), 1), "\\?"), 2
        ).alias("qs"),
    )
    curl = F.concat(
        F.expr("rtrim('/', replace(lower(base), '://www.', '://'))"),
        F.lit("?"),
        F.array_join(
            F.array_sort(
                F.filter(
                    F.split(F.col("qs"), "&"),
                    lambda p: ~p.startswith("utm"),
                )
            ),
            "&",
        ),
    )
    return (
        parts.select("event_id", curl.alias("curl"))
        .groupBy("curl")
        .agg(
            F.count("*").cast("long").alias("n_dups"),
            F.min("event_id").cast("long").alias("min_event"),
            F.max("event_id").cast("long").alias("max_event"),
        )
        .filter(F.col("n_dups") >= 2)
        .orderBy("curl")
    )


# --------------------------------------------- robots.txt rules


@register_extra(
    "robots_rule_match",
    """
    WITH hosts AS (SELECT h.range AS host FROM range(12) h),
    rules AS (
      SELECT host, r.range AS rule_id,
             '/p/' || CAST(('0x' || substr(md5('rbd:' || host || ':'
                 || r.range), 1, 4))::INT % 30 AS VARCHAR)
             || (CASE WHEN ('0x' || substr(md5('rbl:' || host || ':'
                   || r.range), 1, 2))::INT % 2 = 0 THEN '/' ELSE '' END)
               AS prefix,
             ('0x' || substr(md5('rba:' || host || ':' || r.range),
                             1, 2))::INT % 2 = 0 AS allow
      FROM hosts CROSS JOIN range(6) r
    ),
    pages AS (
      SELECT event_id,
             ('0x' || substr(md5('rph:' || event_id), 1, 4))::INT % 12
               AS host,
             '/p/' || CAST(('0x' || substr(md5('rpp:' || event_id),
                 1, 4))::INT % 30 AS VARCHAR)
             || (CASE WHEN ('0x' || substr(md5('rps:' || event_id),
                   1, 2))::INT % 3 = 0 THEN '/x' ELSE '' END) AS path
      FROM events WHERE event_id % 5 = 0
    ),
    matched AS (
      SELECT p.event_id, p.host,
             max(CASE WHEN starts_with(p.path, r.prefix) THEN
               length(r.prefix) * 10 + CAST(r.allow AS INT) * 5
               + (4 - r.rule_id % 5) END) AS enc
      FROM pages p LEFT JOIN rules r ON r.host = p.host
      GROUP BY 1, 2
    )
    SELECT host, CAST(count(*) AS BIGINT) AS n_pages,
           CAST(count(*) FILTER (enc IS NOT NULL AND enc % 10 >= 5)
                AS BIGINT) AS n_allowed,
           CAST(count(*) FILTER (enc IS NOT NULL AND enc % 10 < 5)
                AS BIGINT) AS n_denied,
           CAST(count(*) FILTER (enc IS NULL) AS BIGINT) AS n_default
    FROM matched GROUP BY host ORDER BY host
    """,
)
def robots_rule_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """robots.txt-style longest-prefix rule resolution — the crawler-
    compliance gate of a web corpus pipeline: per page, the matching
    rule with the LONGEST path prefix wins, and on equal length the
    least-restrictive (allow) wins (the Google REP tie-break);
    unmatched pages fall to default-allow. Rules and pages are
    md5-derived with both '/p/N' and '/p/N/' prefixes so prefix LENGTH
    genuinely decides. The winner is packed as length*10 + allow*5 +
    rule-slot so one max() resolves match, tie-break and decision in
    a single agg — no window needed; the oracle uses the identical
    packing over the textbook join. Scale: rules are a broadcast dim
    (robots files are tiny per host); pages stream map-side into the
    per-host partial max."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") % 5 == 0)
    eid = F.col("event_id").cast("string")

    def _hh(prefix: str, col: F.Column, chars: int) -> F.Column:
        return F.conv(
            F.substring(
                F.md5(F.concat(F.lit(prefix), col).cast("binary")), 1, chars
            ),
            16,
            10,
        ).cast("long")

    hosts = spark.range(12).select(F.col("id").alias("host"))
    rids = spark.range(6).select(F.col("id").alias("rule_id"))
    hr = F.concat(
        F.col("host").cast("string"), F.lit(":"),
        F.col("rule_id").cast("string"),
    )
    rules = hosts.crossJoin(rids).select(
        "host",
        "rule_id",
        F.concat(
            F.lit("/p/"),
            (_hh("rbd:", hr, 4).cast("int") % 30).cast("string"),
            F.when(_hh("rbl:", hr, 2).cast("int") % 2 == 0, F.lit("/"))
            .otherwise(F.lit("")),
        ).alias("prefix"),
        (_hh("rba:", hr, 2).cast("int") % 2 == 0).alias("allow"),
    )
    pages = ev.select(
        "event_id",
        (_hh("rph:", eid, 4).cast("int") % 12).alias("host"),
        F.concat(
            F.lit("/p/"),
            (_hh("rpp:", eid, 4).cast("int") % 30).cast("string"),
            F.when(_hh("rps:", eid, 2).cast("int") % 3 == 0, F.lit("/x"))
            .otherwise(F.lit("")),
        ).alias("path"),
    )
    matched = (
        pages.join(F.broadcast(rules), "host", "left")
        .groupBy("event_id", "host")
        .agg(
            F.max(
                F.when(
                    F.expr("startswith(path, prefix)"),
                    F.length("prefix") * 10
                    + F.col("allow").cast("int") * 5
                    + (4 - F.col("rule_id") % 5),
                )
            ).alias("enc")
        )
    )
    return (
        matched.groupBy("host")
        .agg(
            F.count("*").cast("long").alias("n_pages"),
            F.count(
                F.when(
                    F.col("enc").isNotNull() & (F.col("enc") % 10 >= 5), 1
                )
            )
            .cast("long")
            .alias("n_allowed"),
            F.count(
                F.when(
                    F.col("enc").isNotNull() & (F.col("enc") % 10 < 5), 1
                )
            )
            .cast("long")
            .alias("n_denied"),
            F.count(F.when(F.col("enc").isNull(), 1))
            .cast("long")
            .alias("n_default"),
        )
        .orderBy("host")
    )


# --------------------------------------------- Huffman dictionary


@register_extra(
    "huffman_code_cost",
    """
    WITH RECURSIVE tok AS (
      SELECT source, unnest(string_split(text, ' ')) AS w FROM documents
    ),
    freq AS (
      SELECT source, w, count(*) AS f FROM tok WHERE w <> ''
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT source, f, dense_rank() OVER (ORDER BY w) AS m FROM freq
    ),
    init AS (
      SELECT source,
             list({'f': f, 'm': m, 'd': 0} ORDER BY f, m) AS items,
             CAST(0 AS BIGINT) AS cost,
             count(*) AS n_symbols
      FROM ranked GROUP BY source
    ),
    fold(source, items, cost, n_symbols) AS (
      SELECT source, items, cost, n_symbols FROM init
      UNION ALL
      SELECT source,
        list_sort(list_append(items[3:],
          {'f': items[1].f + items[2].f,
           'm': least(items[1].m, items[2].m),
           'd': greatest(items[1].d, items[2].d) + 1})),
        cost + items[1].f + items[2].f,
        n_symbols
      FROM fold WHERE len(items) > 1
    ),
    fin AS (SELECT * FROM fold WHERE len(items) = 1)
    SELECT source, CAST(n_symbols AS BIGINT) AS n_symbols,
           CAST(items[1].f AS BIGINT) AS total_tokens,
           CAST(cost AS BIGINT) AS huffman_bits,
           CAST(items[1].d AS BIGINT) AS max_depth
    FROM fin ORDER BY source
    """,
)
def huffman_code_cost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Huffman dictionary construction per corpus source — the
    entropy-coding backbone of every compression advisor: total
    encoded bits = the sum of all merge weights (each merge pushes its
    subtree one level deeper), built with the deterministic (freq,
    min-symbol-rank) tie-break so even max CODE depth — which unlike
    cost is NOT unique across valid Huffman trees — is pinned on both
    sides. Spark does what scales: term frequencies are ONE distributed
    map-side-combining groupBy over the corpus (the 100 TB part), then
    the ~30-symbol priority-queue fold runs per source inside
    applyInPandas (the model-build-on-aggregates pattern — the fold
    input is already tiny). The oracle replays the identical fold as a
    recursive sorted-list machine. Cross-checks char_entropy's lower
    bound from the other side (huffman_bits/total >= entropy)."""
    docs = _t(spark, sf_dir, "documents")
    freq = (
        docs.select(
            "source", F.explode(F.split("text", " ")).alias("w")
        )
        .filter(F.col("w") != "")
        .groupBy("source", "w")
        .agg(F.count("*").alias("f"))
    )
    ranked = freq.withColumn(
        "m", F.dense_rank().over(Window.orderBy("w"))
    ).select("source", "f", "m")

    def _huff(key, pdf):
        import heapq

        import pandas as pd

        h = sorted((int(f), int(m), 0) for f, m in zip(pdf["f"], pdf["m"]))
        n_symbols = len(h)
        heapq.heapify(h)
        cost = 0
        while len(h) > 1:
            f1, m1, d1 = heapq.heappop(h)
            f2, m2, d2 = heapq.heappop(h)
            cost += f1 + f2
            heapq.heappush(h, (f1 + f2, min(m1, m2), max(d1, d2) + 1))
        f, _, d = h[0]
        return pd.DataFrame(
            [(key[0], n_symbols, f, cost, d)],
            columns=[
                "source", "n_symbols", "total_tokens", "huffman_bits",
                "max_depth",
            ],
        )

    return (
        ranked.groupBy("source")
        .applyInPandas(
            _huff,
            "source string, n_symbols long, total_tokens long,"
            " huffman_bits long, max_depth long",
        )
        .orderBy("source")
    )


# --------------------------------------------- budgeted selection


@register_extra(
    "knapsack_budget_selection",
    """
    WITH RECURSIVE items AS (
      SELECT source, doc_id,
             greatest(1, n_chars // 100) AS w,
             ('0x' || substr(md5('kv:' || doc_id), 1, 4))::BIGINT % 100
               AS v,
             row_number() OVER (PARTITION BY source ORDER BY doc_id)
               AS step
      FROM documents WHERE doc_id % 3 = 0
    ),
    ns AS (SELECT source, max(step) AS n, count(*) AS n_items
           FROM items GROUP BY source),
    dp(source, step, t) AS (
      SELECT source, 0,
             list_transform(range(0, 16), c -> CAST(0 AS BIGINT))
      FROM ns
      UNION ALL
      SELECT d.source, d.step + 1,
        list_transform(range(0, 16), c ->
          CASE WHEN c >= i.w
               THEN greatest(d.t[c + 1], d.t[c - i.w + 1] + i.v)
               ELSE d.t[c + 1] END)
      FROM dp d JOIN items i ON i.source = d.source
                            AND i.step = d.step + 1
    ),
    fin AS (
      SELECT d.source, ns.n_items, d.t
      FROM dp d JOIN ns ON ns.source = d.source AND d.step = ns.n
    )
    SELECT source, CAST(n_items AS BIGINT) AS n_items,
           CAST(list_max(t) AS BIGINT) AS best_value,
           CAST(list_position(t, list_max(t)) - 1 AS BIGINT)
             AS min_cap_at_best
    FROM fin ORDER BY source
    """,
)
def knapsack_budget_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """0/1 knapsack over each corpus source: pick documents maximizing
    total quality under a 15-unit token budget (weights = size in
    100-char units, values = md5 quality scores) — the budgeted
    data-selection problem every 'fit the best corpus slice in N
    tokens' pipeline solves exactly at small n before reaching for the
    greedy ratio heuristic. Spark runs the DP per source inside
    applyInPandas (items ordered by doc_id, a 16-slot numpy table —
    per-key sequential state, keys fan out); the oracle steps the SAME
    DP as a recursive CTE whose table is a 16-long LIST per source,
    all sources in lockstep. Outputs include the SMALLEST capacity
    achieving the optimum (the pareto corner), which pins the whole
    table, not just its max."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 0)
    items = docs.select(
        "source",
        "doc_id",
        F.greatest(F.lit(1), F.expr("n_chars div 100")).alias("w"),
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("kv:"), F.col("doc_id").cast("string")
                        ).cast("binary")
                    ),
                    1,
                    4,
                ),
                16,
                10,
            ).cast("long")
            % 100
        ).alias("v"),
    )

    def _ks(key, pdf):
        import numpy as np
        import pandas as pd

        pdf = pdf.sort_values("doc_id")
        dp = np.zeros(16, np.int64)
        for w, v in zip(pdf["w"].astype(int), pdf["v"].astype(int)):
            ndp = dp.copy()
            for c in range(15, w - 1, -1):
                ndp[c] = max(dp[c], dp[c - w] + v)
            dp = ndp
        best = int(dp.max())
        return pd.DataFrame(
            [(key[0], len(pdf), best, int(np.argmax(dp == best)))],
            columns=["source", "n_items", "best_value", "min_cap_at_best"],
        )

    return (
        items.groupBy("source")
        .applyInPandas(
            _ks,
            "source string, n_items long, best_value long,"
            " min_cap_at_best long",
        )
        .orderBy("source")
    )


# --------------------------------------------- TextRank keywords


def _tr_iter_sql(prev: str, out: str) -> str:
    return f"""
    {out} AS MATERIALIZED (
      SELECT n.node,
             CAST(150000000000 +
                  (85 * coalesce(sum(r.rank_e12 // d.outdeg), 0)) // 100
                  AS BIGINT) AS rank_e12
      FROM nodes n
      LEFT JOIN e ON e.dst = n.node
      LEFT JOIN deg d ON d.src = e.src
      LEFT JOIN {prev} r ON r.node = e.src
      GROUP BY n.node
    )"""


@register_extra(
    "textrank_keywords",
    f"""
    WITH tok AS (SELECT string_split(text, ' ') AS t FROM documents),
    adj AS (SELECT unnest(list_zip(t[1:-2], t[2:])) AS p FROM tok),
    e AS MATERIALIZED (
      SELECT DISTINCT p[1] AS src, p[2] AS dst FROM adj
      WHERE p[1] <> p[2] AND p[1] <> '' AND p[2] <> ''
    ),
    nodes AS MATERIALIZED (
      SELECT src AS node FROM e UNION SELECT dst FROM e
    ),
    deg AS MATERIALIZED (
      SELECT src, count(*) AS outdeg FROM e GROUP BY src
    ),
    r0 AS (SELECT node, CAST(1000000000000 AS BIGINT) AS rank_e12
           FROM nodes),
    {_tr_iter_sql('r0', 'r1')},
    {_tr_iter_sql('r1', 'r2')},
    {_tr_iter_sql('r2', 'r3')}
    SELECT node AS word, rank_e12 FROM r3 ORDER BY rank_e12 DESC, word
    """,
)
def textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keyword scoring (Mihalcea & Tarau) — PageRank over the
    word co-occurrence graph (directed token-adjacency edges across
    the whole corpus), the classic unsupervised keyword extractor.
    Reuses the gated pagerank operator (operators/sketches.py::
    pagerank_e12, integer e12 fixed point — the same message-passing
    join+agg per iteration, only the 16-byte/node rank table
    re-shuffles at scale); string-typed nodes exercise the operator's
    key-type generality. The oracle unrolls the three iterations
    relationally over an adjacency built with the list_zip
    neighboring-pairs idiom. Output: every vocabulary word with its
    exact e12 rank — corpus function words win, which is precisely
    why real TextRank runs a stopword filter first (the gated
    text_cleaning query)."""
    from ..operators.sketches import pagerank_e12

    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(F.split("text", " ").alias("t"))
    pairs = tok.select(
        F.explode(
            F.arrays_zip(
                F.slice(F.col("t"), 1, F.size("t") - 1),
                F.slice(F.col("t"), 2, F.size("t") - 1),
            )
        ).alias("p")
    ).select(F.col("p.0").alias("src"), F.col("p.1").alias("dst"))
    e = pairs.filter(
        (F.col("src") != F.col("dst"))
        & (F.col("src") != "")
        & (F.col("dst") != "")
    ).distinct()
    ranks = pagerank_e12(e, iters=3)
    return ranks.select(F.col("node").alias("word"), "rank_e12").orderBy(
        F.col("rank_e12").desc(), "word"
    )


# --------------------------------------------------- ROUGE-L (LCS) pairs


@register_extra(
    "rouge_lcs_pairs",
    """
    WITH RECURSIVE d AS (
      SELECT doc_id, lang, n_chars // 64 AS bk,
             list_slice(list_filter(string_split(text, ' '),
                                    t -> t <> ''), 1, 24) AS toks
      FROM documents
    ),
    pairs AS (
      SELECT a.doc_id AS ida, b.doc_id AS idb,
             row_number() OVER (ORDER BY a.doc_id, b.doc_id) AS pid,
             a.toks AS ta, b.toks AS tb
      FROM d a JOIN d b
        ON a.lang = b.lang AND a.bk = b.bk AND a.doc_id < b.doc_id
      WHERE ('0x' || substr(md5('lcs:' || CAST(a.doc_id AS VARCHAR)
               || ':' || CAST(b.doc_id AS VARCHAR)), 1, 4))::BIGINT
            % 97 = 0
        AND len(a.toks) > 0 AND len(b.toks) > 0
    ),
    ai AS (
      SELECT pid, u.i AS i, u.tok AS tok
      FROM (SELECT pid,
                   unnest(list_transform(ta,
                     (x, i) -> {'i': i, 'tok': x})) AS u
            FROM pairs)
    ),
    st(pid, i, row) AS (
      SELECT pid, CAST(0 AS BIGINT),
             list_transform(tb, x -> CAST(0 AS BIGINT))
               || [CAST(0 AS BIGINT)]
      FROM pairs
      UNION ALL
      SELECT s2.pid, s2.i,
             [CAST(0 AS BIGINT)] || list_transform(s2.tmp,
               (x, j) -> list_max(list_slice(s2.tmp, 1, j)))
      FROM (
        SELECT s1.pid, s1.i,
               list_transform(s1.tb, (x, j) ->
                 greatest(s1.row[j + 1],
                          s1.row[j] + CASE WHEN x = s1.tok
                                           THEN 1 ELSE 0 END)) AS tmp
        FROM (
          SELECT st.pid, st.i + 1 AS i, st.row, ai.tok, p.tb
          FROM st
          JOIN ai ON ai.pid = st.pid AND ai.i = st.i + 1
          JOIN pairs p ON p.pid = st.pid
        ) s1
      ) s2
    ),
    fin AS (
      SELECT pid, row[len(row)] AS lcs
      FROM (SELECT pid, row,
                   row_number() OVER (PARTITION BY pid
                                      ORDER BY i DESC) AS rn
            FROM st) WHERE rn = 1
    )
    SELECT p.ida, p.idb,
           CAST(len(p.ta) AS BIGINT) AS la,
           CAST(len(p.tb) AS BIGINT) AS lb,
           CAST(f.lcs AS BIGINT) AS lcs,
           CAST(2000 * f.lcs // (len(p.ta) + len(p.tb)) AS BIGINT)
             AS f_milli
    FROM fin f JOIN pairs p USING (pid)
    ORDER BY ida, idb
    """,
)
def rouge_lcs_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROUGE-L scoring of blocked document pairs — longest-common-
    SUBSEQUENCE overlap, the order-aware cousin of n-gram Jaccard used
    for summarization eval and near-dup detection where token ORDER
    matters (reordered boilerplate scores low here but high on
    bag-of-ngrams). Blocking (lang, n_chars//64, md5 pair gate) bounds
    the quadratic exactly like edit_distance_blocked; the refine runs
    the O(la*lb) DP per pair INSIDE a mapInPandas batch with the row
    recurrence vectorized over the b-axis (new_row = prefix-max of
    elementwise max(carry, diag+match) — verified equivalent to the
    textbook 2-D DP). The oracle replays the identical row recurrence
    as a recursive list machine whose prefix-max is list_max over a
    slice. F-measure kept exact-integer as f_milli =
    2000*lcs // (la+lb). Token cap 24 bounds per-pair work; at 100 TB
    the blocked-pairs shuffle carries token arrays only for gated
    candidates, never all-pairs."""
    d = (
        _t(spark, sf_dir, "documents")
        .select(
            "doc_id",
            "lang",
            F.expr("n_chars div 64").alias("bk"),
            F.slice(
                F.filter(F.split("text", " "), lambda x: x != ""), 1, 24
            ).alias("toks"),
        )
        .filter(F.size("toks") > 0)
    )
    a = d.select(
        F.col("doc_id").alias("ida"), "lang", "bk",
        F.col("toks").alias("ta"),
    )
    b = d.select(
        F.col("doc_id").alias("idb"), "lang", "bk",
        F.col("toks").alias("tb"),
    )
    gate = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("lcs:"),
                        F.col("ida").cast("string"),
                        F.lit(":"),
                        F.col("idb").cast("string"),
                    ).cast("binary")
                ),
                1,
                4,
            ),
            16,
            10,
        ).cast("long")
        % 97
        == 0
    )
    pairs = (
        a.join(b, ["lang", "bk"])
        .filter(F.col("ida") < F.col("idb"))
        .filter(gate)
        .select("ida", "idb", "ta", "tb")
    )

    def _lcs(it):
        import numpy as np
        import pandas as pd

        for pdf in it:
            out = []
            for ida, idb, ta, tb in zip(
                pdf["ida"], pdf["idb"], pdf["ta"], pdf["tb"]
            ):
                bb = np.array(list(tb), dtype=object)
                row = np.zeros(len(bb) + 1, dtype=np.int64)
                for tok in ta:
                    cand = row[:-1] + (bb == tok)
                    tmp = np.maximum(row[1:], cand)
                    row = np.concatenate(
                        ([0], np.maximum.accumulate(tmp))
                    )
                lcs, la, lb = int(row[-1]), len(ta), len(bb)
                out.append(
                    (
                        int(ida),
                        int(idb),
                        la,
                        lb,
                        lcs,
                        2000 * lcs // (la + lb),
                    )
                )
            if out:
                yield pd.DataFrame(
                    out,
                    columns=["ida", "idb", "la", "lb", "lcs", "f_milli"],
                )

    return pairs.mapInPandas(
        _lcs,
        "ida long, idb long, la long, lb long, lcs long, f_milli long",
    ).orderBy("ida", "idb")


# --------------------------------------- Kneser-Ney / Good-Turing smoothing


_KN_TOKENS_SQL = """
    toks0 AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), t -> t <> '') AS toks
      FROM documents
    ),
    bg AS (
      SELECT u.v AS v, u.w AS w
      FROM (SELECT unnest(list_transform(toks,
              (x, i) -> {'v': x, 'w': toks[i + 1]})) AS u
            FROM toks0)
      WHERE u.w IS NOT NULL
    )
"""


@register_extra(
    "kneser_ney_bigram",
    f"""
    WITH {_KN_TOKENS_SQL},
    cvw AS (SELECT v, w, count(*) AS c_vw FROM bg GROUP BY 1, 2),
    cv AS (SELECT v, sum(c_vw) AS c_v, count(*) AS n1v FROM cvw GROUP BY 1),
    cw AS (SELECT w, count(*) AS n1w FROM cvw GROUP BY 1),
    tot AS (SELECT count(*) AS n1all FROM cvw),
    top AS (
      SELECT v, w, c_vw FROM cvw
      ORDER BY c_vw DESC, v, w LIMIT 20
    )
    SELECT t.v, t.w,
           CAST(t.c_vw AS BIGINT) AS c_vw,
           CAST(cv.c_v AS BIGINT) AS c_v,
           CAST(cv.n1v AS BIGINT) AS n1v,
           CAST(cw.n1w AS BIGINT) AS n1w,
           CAST(1000000 * ((4 * t.c_vw - 3) * tot.n1all
                           + 3 * cv.n1v * cw.n1w)
                // (4 * cv.c_v * tot.n1all) AS BIGINT) AS p_kn_micro
    FROM top t
    JOIN cv USING (v) JOIN cw USING (w) CROSS JOIN tot
    ORDER BY c_vw DESC, v, w
    """,
)
def kneser_ney_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram probabilities — the LM smoothing
    that powers n-gram perplexity filters (CCNet-style corpus quality
    scoring uses exactly these models): absolute discount D=3/4 off
    every seen bigram, redistributed through the CONTINUATION
    distribution (how many distinct left contexts a word follows —
    KN's famous fix for 'Francisco'). The whole estimator is four
    count aggregations (c_vw, c_v + distinct continuations of v,
    distinct left contexts of w, total distinct bigrams) — partial-agg
    shuffles on fixed-width keys, the same shape as bigram_lm_scores,
    nothing else; probability kept EXACT by clearing denominators:
    p = ((4*c_vw - 3)*N1all + 3*N1+(v.)*N1+(.w)) / (4*c_v*N1all),
    reported as the floor-scaled p_kn_micro. Top-20 bigrams by
    (count desc, v, w) — a deterministic slice on both engines."""
    toks = (
        _t(spark, sf_dir, "documents")
        .select(
            F.filter(F.split("text", " "), lambda x: x != "").alias(
                "toks"
            )
        )
    )
    bg = (
        toks.select(
            F.explode(
                F.expr(
                    "transform(toks, (x, i) ->"
                    " struct(x AS v, try_element_at(toks, i + 2) AS w))"
                )
            ).alias("u")
        )
        .select("u.v", "u.w")
        .filter(F.col("w").isNotNull())
    )
    cvw = bg.groupBy("v", "w").agg(F.count(F.lit(1)).alias("c_vw"))
    cv = cvw.groupBy("v").agg(
        F.sum("c_vw").alias("c_v"), F.count(F.lit(1)).alias("n1v")
    )
    cw = cvw.groupBy("w").agg(F.count(F.lit(1)).alias("n1w"))
    tot = cvw.agg(F.count(F.lit(1)).alias("n1all"))
    top = cvw.orderBy(F.desc("c_vw"), "v", "w").limit(20)
    j = (
        top.join(cv, "v")
        .join(cw, "w")
        .crossJoin(F.broadcast(tot))
    )
    return j.select(
        "v",
        "w",
        F.col("c_vw").cast("long").alias("c_vw"),
        F.col("c_v").cast("long").alias("c_v"),
        F.col("n1v").cast("long").alias("n1v"),
        F.col("n1w").cast("long").alias("n1w"),
        F.expr(
            "(1000000 * ((4 * c_vw - 3) * n1all + 3 * n1v * n1w))"
            " div (4 * c_v * n1all)"
        )
        .cast("long")
        .alias("p_kn_micro"),
    ).orderBy(F.desc("c_vw"), "v", "w")


@register_extra(
    "good_turing_counts",
    f"""
    WITH {_KN_TOKENS_SQL},
    tg AS (
      SELECT u.a || ' ' || u.b || ' ' || u.c AS g
      FROM (SELECT unnest(list_transform(toks,
              (x, i) -> {{'a': x, 'b': toks[i + 1],
                          'c': toks[i + 2]}})) AS u
            FROM toks0)
      WHERE u.c IS NOT NULL
    ),
    uni AS (SELECT g, count(*) AS c FROM tg GROUP BY 1),
    nr AS (
      SELECT c AS r, count(*) AS n_r FROM uni WHERE c <= 11 GROUP BY 1
    )
    SELECT CAST(a.r AS BIGINT) AS r,
           CAST(a.n_r AS BIGINT) AS n_r,
           CAST(1000 * (a.r + 1) * coalesce(b.n_r, 0)
                // a.n_r AS BIGINT) AS r_star_milli
    FROM nr a LEFT JOIN nr b ON b.r = a.r + 1
    WHERE a.r <= 10
    ORDER BY a.r
    """,
)
def good_turing_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Good-Turing frequency re-estimation — the count-of-counts
    smoothing (r* = (r+1) N_{{r+1}} / N_r) that underlies unseen-mass
    estimation in every classical LM and in dataset-coverage audits
    ('how much probability mass do hapaxes hold?'). Counted over
    TRIGRAM types (the synthetic corpus' unigram vocab is closed — 31
    words, none rare — while its trigram tail is genuinely Zipfian:
    ~9k hapaxes at sf0.01). Two partial-agg shuffles: trigram counts,
    then frequency-of-frequencies — the N_r histogram is tiny whatever
    the corpus size, which is the whole scale story. The adjusted
    count is kept exact-integer as r_star_milli =
    1000*(r+1)*N_{{r+1}} // N_r for r = 1..10."""
    toks = (
        _t(spark, sf_dir, "documents")
        .select(
            F.filter(F.split("text", " "), lambda x: x != "").alias(
                "toks"
            )
        )
    )
    tg = (
        toks.select(
            F.explode(
                F.expr(
                    "transform(toks, (x, i) -> struct("
                    "x AS a, try_element_at(toks, i + 2) AS b,"
                    " try_element_at(toks, i + 3) AS c))"
                )
            ).alias("u")
        )
        .filter(F.col("u.c").isNotNull())
        .select(
            F.concat_ws(" ", "u.a", "u.b", "u.c").alias("g")
        )
    )
    uni = tg.groupBy("g").agg(F.count(F.lit(1)).alias("c"))
    nr = (
        uni.filter(F.col("c") <= 11)
        .groupBy("c")
        .agg(F.count(F.lit(1)).alias("n_r"))
        .withColumnRenamed("c", "r")
    )
    b = nr.select(
        (F.col("r") - 1).alias("r"), F.col("n_r").alias("n_r1")
    )
    return (
        nr.filter(F.col("r") <= 10)
        .join(b, "r", "left")
        .select(
            F.col("r").cast("long").alias("r"),
            F.col("n_r").cast("long").alias("n_r"),
            F.expr(
                "(1000 * (r + 1) * coalesce(n_r1, 0)) div n_r"
            )
            .cast("long")
            .alias("r_star_milli"),
        )
        .orderBy("r")
    )


# ------------------------------------------------ reciprocal rank fusion


@register_extra(
    "reciprocal_rank_fusion",
    """
    WITH scored AS (
      SELECT q.q, d.doc_id,
             ('0x' || substr(md5('ra:' || CAST(q.q AS VARCHAR) || ':'
                || CAST(d.doc_id AS VARCHAR)), 1, 5))::BIGINT
               % 100000 AS sa,
             ('0x' || substr(md5('rb:' || CAST(q.q AS VARCHAR) || ':'
                || CAST(d.doc_id AS VARCHAR)), 1, 5))::BIGINT
               % 100000 AS sb
      FROM (SELECT unnest(generate_series(0, 9)) AS q) q, documents d
    ),
    ra AS (
      SELECT q, doc_id,
             row_number() OVER (PARTITION BY q
                                ORDER BY sa DESC, doc_id) AS r
      FROM scored
    ),
    rb AS (
      SELECT q, doc_id,
             row_number() OVER (PARTITION BY q
                                ORDER BY sb DESC, doc_id) AS r
      FROM scored
    ),
    hits AS (
      SELECT q, doc_id, 1000000 // (60 + r) AS pts
      FROM ra WHERE r <= 50
      UNION ALL
      SELECT q, doc_id, 1000000 // (60 + r) FROM rb WHERE r <= 50
    ),
    fused AS (
      SELECT q, doc_id, sum(pts) AS rrf_micro FROM hits GROUP BY 1, 2
    )
    SELECT q, doc_id, CAST(rrf_micro AS BIGINT) AS rrf_micro
    FROM (SELECT q, doc_id, rrf_micro,
                 row_number() OVER (PARTITION BY q
                                    ORDER BY rrf_micro DESC, doc_id)
                   AS rn
          FROM fused)
    WHERE rn <= 5
    ORDER BY q, rrf_micro DESC, doc_id
    """,
)
def reciprocal_rank_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion — the standard hybrid-search combiner
    (Cormack 2009; what Elasticsearch/Vespa/every RAG stack uses to
    merge a lexical BM25 list with an embedding-ANN list): each
    retrieval system contributes 1/(60+rank) for its top-50, summed per
    (query, doc). Both rankings here are md5-derived score surrogates
    (the REAL bm25/ANN operators are gated separately — this gates the
    FUSION algebra); the constant is cleared to exact integers as
    1000000 // (60 + r). Scale shape: two per-query window ranks (one
    sort shuffle each, partitioned by query — at corpus scale, by
    query batch), a union, one partial-agg sum, one top-5 window —
    no per-row Python anywhere. Ties pinned by doc_id on both
    engines."""
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    qs = spark.range(0, 10).select(F.col("id").alias("q"))
    scored = qs.crossJoin(docs).select(
        "q",
        "doc_id",
        *[
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.lit(p),
                                F.col("q").cast("string"),
                                F.lit(":"),
                                F.col("doc_id").cast("string"),
                            ).cast("binary")
                        ),
                        1,
                        5,
                    ),
                    16,
                    10,
                ).cast("long")
                % 100000
            ).alias(al)
            for p, al in [("ra:", "sa"), ("rb:", "sb")]
        ],
    )
    wa = Window.partitionBy("q").orderBy(F.desc("sa"), "doc_id")
    wb = Window.partitionBy("q").orderBy(F.desc("sb"), "doc_id")
    ra = scored.select(
        "q", "doc_id", F.row_number().over(wa).alias("r")
    ).filter(F.col("r") <= 50)
    rb = scored.select(
        "q", "doc_id", F.row_number().over(wb).alias("r")
    ).filter(F.col("r") <= 50)
    hits = ra.unionAll(rb).select(
        "q", "doc_id", F.expr("1000000 div (60 + r)").alias("pts")
    )
    fused = hits.groupBy("q", "doc_id").agg(
        F.sum("pts").alias("rrf_micro")
    )
    wf = Window.partitionBy("q").orderBy(F.desc("rrf_micro"), "doc_id")
    return (
        fused.withColumn("rn", F.row_number().over(wf))
        .filter(F.col("rn") <= 5)
        .select("q", "doc_id", F.col("rrf_micro").cast("long").alias("rrf_micro"))
        .orderBy("q", F.desc("rrf_micro"), "doc_id")
    )


# ------------------------------------------- Smith-Waterman alignment


@register_extra(
    "smith_waterman_pairs",
    """
    WITH RECURSIVE d AS (
      SELECT doc_id, lang, n_chars // 64 AS bk,
             string_split(substr(text, 1, 24), '') AS cs
      FROM documents
      WHERE strlen(text) = length(text)
    ),
    pairs AS (
      SELECT a.doc_id AS ida, b.doc_id AS idb,
             row_number() OVER (ORDER BY a.doc_id, b.doc_id) AS pid,
             a.cs AS ca, b.cs AS cb
      FROM d a JOIN d b
        ON a.lang = b.lang AND a.bk = b.bk AND a.doc_id < b.doc_id
      WHERE ('0x' || substr(md5('sw:' || CAST(a.doc_id AS VARCHAR)
               || ':' || CAST(b.doc_id AS VARCHAR)), 1, 4))::BIGINT
            % 89 = 0
        AND len(a.cs) > 0 AND len(b.cs) > 0
    ),
    ai AS (
      SELECT pid, u.i AS i, u.ch AS ch
      FROM (SELECT pid,
                   unnest(list_transform(ca,
                     (x, i) -> {'i': i, 'ch': x})) AS u
            FROM pairs)
    ),
    st(pid, i, row, best) AS (
      SELECT pid, CAST(0 AS BIGINT),
             list_transform(cb, x -> CAST(0 AS BIGINT))
               || [CAST(0 AS BIGINT)],
             CAST(0 AS BIGINT)
      FROM pairs
      UNION ALL
      SELECT s2.pid, s2.i,
             [CAST(0 AS BIGINT)] || s2.nw,
             greatest(s2.best, list_max(s2.nw))
      FROM (
        SELECT s1.pid, s1.i, s1.best,
               list_transform(s1.tmp, (x, j) ->
                 list_max(list_slice(s1.adj, 1, j)) - j) AS nw
        FROM (
          SELECT s0.pid, s0.i, s0.best, s0.tmp,
                 list_transform(s0.tmp, (x, j) -> x + j) AS adj
          FROM (
            SELECT st.pid, st.i + 1 AS i, st.best,
                   list_transform(s.cb, (x, j) ->
                     greatest(CAST(0 AS BIGINT),
                              st.row[j] + CASE WHEN x = s.ch
                                               THEN 2 ELSE -1 END,
                              st.row[j + 1] - 1)) AS tmp
            FROM st
            JOIN (SELECT ai.pid, ai.i, ai.ch, p.cb
                  FROM ai JOIN pairs p USING (pid)) s
              ON s.pid = st.pid AND s.i = st.i + 1
          ) s0
        ) s1
      ) s2
    ),
    fin AS (
      SELECT pid, best
      FROM (SELECT pid, best,
                   row_number() OVER (PARTITION BY pid
                                      ORDER BY i DESC) AS rn
            FROM st) WHERE rn = 1
    )
    SELECT p.ida, p.idb,
           CAST(len(p.ca) AS BIGINT) AS la,
           CAST(len(p.cb) AS BIGINT) AS lb,
           CAST(f.best AS BIGINT) AS sw_score
    FROM fin f JOIN pairs p USING (pid)
    ORDER BY ida, idb
    """,
)
def smith_waterman_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smith-Waterman LOCAL alignment score on blocked document pairs —
    the gapped fuzzy-substring matcher (bioinformatics' workhorse,
    also the right tool for detecting shared boilerplate fragments
    that global edit distance dilutes). Match +2 / mismatch -1 /
    linear gap 1. The left-gap dependency (H[i][j-1]-1) is folded into
    a PREFIX-MAX over tmp[j']+j' minus j (fuzz-verified equal to the
    textbook 2-D DP), so Spark's mapInPandas runs each pair's DP
    vectorized along the b-axis, and the oracle replays the identical
    row recurrence as a recursive list machine. Char unit, ASCII-gated
    docs, 24-char cap, same (lang, len-bucket, md5) blocking family as
    edit_distance_blocked / rouge_lcs_pairs — the quadratic refine
    only ever touches gated candidates."""
    d = (
        _t(spark, sf_dir, "documents")
        .filter(F.octet_length("text") == F.length("text"))
        .select(
            "doc_id",
            "lang",
            F.expr("n_chars div 64").alias("bk"),
            F.split(F.substring("text", 1, 24), "").alias("cs"),
        )
        .withColumn(
            "cs", F.filter(F.col("cs"), lambda x: x != "")
        )
        .filter(F.size("cs") > 0)
    )
    a = d.select(
        F.col("doc_id").alias("ida"), "lang", "bk",
        F.col("cs").alias("ca"),
    )
    b = d.select(
        F.col("doc_id").alias("idb"), "lang", "bk",
        F.col("cs").alias("cb"),
    )
    gate = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("sw:"),
                        F.col("ida").cast("string"),
                        F.lit(":"),
                        F.col("idb").cast("string"),
                    ).cast("binary")
                ),
                1,
                4,
            ),
            16,
            10,
        ).cast("long")
        % 89
        == 0
    )
    pairs = (
        a.join(b, ["lang", "bk"])
        .filter(F.col("ida") < F.col("idb"))
        .filter(gate)
        .select("ida", "idb", "ca", "cb")
    )

    def _sw(it):
        import numpy as np
        import pandas as pd

        for pdf in it:
            out = []
            for ida, idb, ca, cb in zip(
                pdf["ida"], pdf["idb"], pdf["ca"], pdf["cb"]
            ):
                bb = np.array(list(cb), dtype=object)
                m = len(bb)
                row = np.zeros(m + 1, dtype=np.int64)
                best = 0
                idx = np.arange(1, m + 1)
                for ch in ca:
                    diag = row[:-1] + np.where(bb == ch, 2, -1)
                    up = row[1:] - 1
                    tmp = np.maximum(0, np.maximum(diag, up))
                    new = np.maximum.accumulate(tmp + idx) - idx
                    row = np.concatenate(([0], new))
                    best = max(best, int(row.max()))
                out.append((int(ida), int(idb), len(ca), m, best))
            if out:
                yield pd.DataFrame(
                    out, columns=["ida", "idb", "la", "lb", "sw_score"]
                )

    return pairs.mapInPandas(
        _sw, "ida long, idb long, la long, lb long, sw_score long"
    ).orderBy("ida", "idb")


# ------------------------------------------------- BWT + MTF pipeline


_BWT_SQL = """
    dd AS (
      SELECT doc_id, substr(text, 1, 24) AS t,
             length(substr(text, 1, 24)) AS tl
      FROM documents
      WHERE strlen(text) = length(text)
        AND ('0x' || substr(md5('bw:' || CAST(doc_id AS VARCHAR)),
                            1, 4))::BIGINT % 11 = 0
    ),
    rots AS (
      SELECT doc_id, tl, u.k AS k,
             substr(t, CAST(u.k + 1 AS INT))
               || substr(t, 1, CAST(u.k AS INT)) AS rot
      FROM (SELECT doc_id, t, tl,
                   unnest(list_transform(string_split(t, ''),
                     (c, i) -> {'k': i - 1})) AS u
            FROM dd)
    ),
    ranked AS (
      SELECT doc_id, tl,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY rot, k) AS r,
             substr(rot, CAST(tl AS INT), 1) AS bc
      FROM rots
    ),
    bwt AS (
      SELECT doc_id, max(tl) AS bl,
             string_agg(bc, '' ORDER BY r) AS b
      FROM ranked GROUP BY doc_id
    )
"""


@register_extra(
    "bwt_run_stats",
    f"""
    WITH {_BWT_SQL},
    runs AS (
      SELECT doc_id,
             count(*) FILTER (WHERE prev IS NOT NULL AND bc <> prev)
               + 1 AS n_runs
      FROM (SELECT doc_id, bc,
                   lag(bc) OVER (PARTITION BY doc_id ORDER BY r)
                     AS prev
            FROM ranked)
      GROUP BY doc_id
    )
    SELECT b.doc_id, CAST(b.bl AS BIGINT) AS bl, b.b AS bwt,
           CAST(r.n_runs AS BIGINT) AS n_runs
    FROM bwt b JOIN runs r USING (doc_id)
    ORDER BY doc_id
    """,
)
def bwt_run_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burrows-Wheeler transform + run statistics — stage 1 of the
    bzip2 pipeline and the heart of FM-index text search: sort all
    rotations, read the last column; like-characters cluster, so the
    BWT's run count is the classic compressibility probe (and r, the
    run count, is THE parameter of r-index scaling). Rotation sort is
    a window rank per doc — at corpus scale a range-partitioned sort
    per key, the suffix-array shape; everything stays JVM-side string
    algebra. Equal rotations tie-break by offset k but yield the same
    last char, so the BWT string is well-defined on both engines.
    ASCII-gated, 24-char cap, md5 doc sample."""
    d = (
        _t(spark, sf_dir, "documents")
        .filter(F.octet_length("text") == F.length("text"))
        .filter(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("bw:"), F.col("doc_id").cast("string")
                        ).cast("binary")
                    ),
                    1,
                    4,
                ),
                16,
                10,
            ).cast("long")
            % 11
            == 0
        )
        .select(
            "doc_id",
            F.substring("text", 1, 24).alias("t"),
            F.length(F.substring("text", 1, 24)).alias("tl"),
        )
    )
    rots = d.select(
        "doc_id",
        "tl",
        F.explode(
            F.sequence(F.lit(0), F.col("tl") - 1)
        ).alias("k"),
        "t",
    ).select(
        "doc_id",
        "tl",
        "k",
        F.expr(
            "concat(substring(t, k + 1, 24), substring(t, 1, k))"
        ).alias("rot"),
    )
    wr = Window.partitionBy("doc_id").orderBy("rot", "k")
    ranked = rots.select(
        "doc_id",
        "tl",
        F.row_number().over(wr).alias("r"),
        F.expr("substring(rot, tl, 1)").alias("bc"),
    )
    wl = Window.partitionBy("doc_id").orderBy("r")
    runs = (
        ranked.withColumn("prev", F.lag("bc").over(wl))
        .groupBy("doc_id")
        .agg(
            (
                F.count(
                    F.when(
                        F.col("prev").isNotNull()
                        & (F.col("bc") != F.col("prev")),
                        1,
                    )
                )
                + 1
            ).alias("n_runs")
        )
    )
    bwt = ranked.groupBy("doc_id").agg(
        F.max("tl").alias("bl"),
        F.concat_ws(
            "",
            F.transform(
                F.array_sort(F.collect_list(F.struct("r", "bc"))),
                lambda s: s["bc"],
            ),
        ).alias("bwt"),
    )
    return (
        bwt.join(runs, "doc_id")
        .select(
            "doc_id",
            F.col("bl").cast("long").alias("bl"),
            "bwt",
            F.col("n_runs").cast("long").alias("n_runs"),
        )
        .orderBy("doc_id")
    )


@register_extra(
    "mtf_code_stats",
    f"""
    WITH RECURSIVE {_BWT_SQL},
    a0 AS (
      SELECT doc_id, bl, b,
             list_sort(list_distinct(string_split(b, ''))) AS alpha
      FROM bwt
    ),
    st(doc_id, i, ord, ssum, mx) AS (
      SELECT doc_id, CAST(0 AS BIGINT), alpha,
             CAST(0 AS BIGINT), CAST(0 AS BIGINT)
      FROM a0
      UNION ALL
      SELECT s1.doc_id, s1.i,
             [s1.c] || list_filter(s1.ord, x -> x <> s1.c),
             s1.ssum + s1.code, greatest(s1.mx, s1.code)
      FROM (
        SELECT st.doc_id, st.i + 1 AS i, st.ord, st.ssum, st.mx,
               a0.b[CAST(st.i + 1 AS INT)] AS c,
               list_position(st.ord,
                             a0.b[CAST(st.i + 1 AS INT)]) - 1 AS code
        FROM st JOIN a0 USING (doc_id)
        WHERE st.i < a0.bl
      ) s1
    )
    SELECT doc_id, CAST(ssum AS BIGINT) AS mtf_sum,
           CAST(mx AS BIGINT) AS mtf_max
    FROM (SELECT doc_id, ssum, mx,
                 row_number() OVER (PARTITION BY doc_id
                                    ORDER BY i DESC) AS rn
          FROM st) WHERE rn = 1
    ORDER BY doc_id
    """,
)
def mtf_code_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Move-to-front coding over the BWT — stage 2 of the bzip2
    pipeline: walk the transformed string keeping a recency-ordered
    alphabet; each symbol emits its current list position then moves
    to front, turning BWT's character clustering into a stream of
    small integers (sum and max reported — the direct compressibility
    payoff of stage 1). The fold is sequential per doc (24 steps) —
    the per-key applyInPandas pattern with docs as the parallel axis;
    the oracle replays it as a recursive list machine whose state is
    the recency list itself. Shares the exact BWT construction with
    bwt_run_stats on both engines."""
    bwt = bwt_run_stats(spark, sf_dir).select("doc_id", "bl", "bwt")

    def _mtf(key, pdf):
        import pandas as pd

        b = pdf["bwt"].iloc[0]
        order = sorted(set(b))
        ssum = mx = 0
        for ch in b:
            code = order.index(ch)
            ssum += code
            mx = max(mx, code)
            order.remove(ch)
            order.insert(0, ch)
        return pd.DataFrame(
            [(int(key[0]), ssum, mx)],
            columns=["doc_id", "mtf_sum", "mtf_max"],
        )

    return (
        bwt.groupBy("doc_id")
        .applyInPandas(_mtf, "doc_id long, mtf_sum long, mtf_max long")
        .orderBy("doc_id")
    )


# ---------------------------------------------------- CRC32 integrity


@register_extra(
    "crc32_audit",
    """
    WITH RECURSIVE tb(i, k, c) AS (
      SELECT i, 0, CAST(i AS BIGINT)
      FROM (SELECT unnest(generate_series(0, 255)) AS i)
      UNION ALL
      SELECT i, k + 1,
             CASE WHEN (c & 1) = 1
                  THEN xor(c >> 1, 3988292384) ELSE c >> 1 END
      FROM tb WHERE k < 8
    ),
    tbl AS (SELECT i, c FROM tb WHERE k = 8),
    dd AS (
      SELECT doc_id, substr(text, 1, 16) AS t,
             length(substr(text, 1, 16)) AS tl
      FROM documents
      WHERE strlen(text) = length(text)
        AND ('0x' || substr(md5('crc:' || CAST(doc_id AS VARCHAR)),
                            1, 4))::BIGINT % 7 = 0
    ),
    st(doc_id, i, crc) AS (
      SELECT doc_id, CAST(0 AS BIGINT), CAST(4294967295 AS BIGINT)
      FROM dd
      UNION ALL
      SELECT s1.doc_id, s1.i, xor(s1.crc >> 8, tbl.c)
      FROM (
        SELECT st.doc_id, st.i + 1 AS i, st.crc,
               xor(st.crc,
                   ascii(substr(dd.t, CAST(st.i + 1 AS INT), 1)))
                 & 255 AS idx
        FROM st JOIN dd USING (doc_id)
        WHERE st.i < dd.tl
      ) s1
      JOIN tbl ON tbl.i = s1.idx
    )
    SELECT d.doc_id, CAST(d.tl AS BIGINT) AS n_bytes,
           CAST(xor(f.crc, 4294967295) AS BIGINT) AS crc32
    FROM dd d
    JOIN (SELECT doc_id, crc
          FROM (SELECT doc_id, crc,
                       row_number() OVER (PARTITION BY doc_id
                                          ORDER BY i DESC) AS rn
                FROM st) WHERE rn = 1) f USING (doc_id)
    ORDER BY doc_id
    """,
)
def crc32_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CRC-32 (IEEE 802.3) content checksums — the integrity primitive
    under every zip/png/parquet page and storage scrubber. REAL
    cross-derivation: the Spark side calls zlib.crc32 (the battle-
    tested C implementation, vectorized per Arrow batch), while the
    oracle implements the algorithm FROM SCRATCH in SQL — a recursive
    CTE builds the 256-entry reflected-polynomial table (8 shift/xor
    steps per entry, poly 0xEDB88320) and a per-doc list-machine folds
    crc = (crc>>8) XOR table[(crc XOR byte) & 0xFF] over the bytes,
    final-xor 0xFFFFFFFF. Any disagreement in table build, byte order,
    or xor/shift semantics breaks the hash. ASCII-gated 16-byte
    prefixes; md5 doc sample. At scale the checksum is embarrassingly
    parallel map work — the same shape the engine's merkle16 partition
    roots build on."""
    d = (
        _t(spark, sf_dir, "documents")
        .filter(F.octet_length("text") == F.length("text"))
        .filter(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("crc:"), F.col("doc_id").cast("string")
                        ).cast("binary")
                    ),
                    1,
                    4,
                ),
                16,
                10,
            ).cast("long")
            % 7
            == 0
        )
        .select("doc_id", F.substring("text", 1, 16).alias("t"))
    )

    def _crc(it):
        import zlib

        import pandas as pd

        for pdf in it:
            if len(pdf):
                yield pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"].astype("int64"),
                        "n_bytes": pdf["t"].str.len().astype("int64"),
                        "crc32": [
                            zlib.crc32(t.encode("ascii")) & 0xFFFFFFFF
                            for t in pdf["t"]
                        ],
                    }
                )

    return d.mapInPandas(
        _crc, "doc_id long, n_bytes long, crc32 long"
    ).orderBy("doc_id")


# ------------------------------------------------ Heaps-law vocab curve


@register_extra(
    "heaps_law_curve",
    """
    WITH toks0 AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), t -> t <> '') AS toks
      FROM documents
    ),
    tok AS (
      SELECT doc_id, u.i AS pos, u.w AS w
      FROM (SELECT doc_id,
                   unnest(list_transform(toks,
                     (x, i) -> {'i': i, 'w': x})) AS u
            FROM toks0)
    ),
    g AS (
      SELECT w,
             row_number() OVER (ORDER BY doc_id, pos) AS gpos
      FROM tok
    ),
    firsts AS (SELECT w, min(gpos) AS fp FROM g GROUP BY 1),
    ckpt AS (
      SELECT 250 * unnest(generate_series(1, 8)) AS n
    )
    SELECT c.n,
           CAST((SELECT count(*) FROM firsts f WHERE f.fp <= c.n)
                AS BIGINT) AS vocab,
           CAST((SELECT count(*) FROM g WHERE g.gpos <= c.n)
                AS BIGINT) AS n_tokens
    FROM ckpt c ORDER BY c.n
    """,
)
def heaps_law_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary-growth curve — distinct-type count after
    the first n tokens, the corpus-linguistics diagnostic every
    tokenizer/dedup study plots (V(n) ~ K*n^beta; a flattening curve
    means the corpus is exhausting its vocabulary — the data-quality
    signal behind 'is more data adding anything new?'). Computed the
    scalable way: ONE global position rank (range-partitioned sort),
    then each type's FIRST occurrence position — so every checkpoint
    V(n) is just count(first_pos <= n), one tiny agg over the type
    table instead of 8 distinct-counts over 8 prefixes. Tokens ordered
    by (doc_id, position) — a total order both engines share. Eight
    250-token checkpoints; exact integers."""
    toks = (
        _t(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.filter(F.split("text", " "), lambda x: x != "").alias(
                "toks"
            ),
        )
        .select(
            "doc_id",
            F.posexplode("toks").alias("pos0", "w"),
        )
        .select("doc_id", (F.col("pos0") + 1).alias("pos"), "w")
    )
    wg = Window.orderBy("doc_id", "pos")
    g = toks.select("w", F.row_number().over(wg).alias("gpos"))
    firsts = g.groupBy("w").agg(F.min("gpos").alias("fp"))
    ckpt = spark.range(1, 9).select((250 * F.col("id")).alias("n"))
    fb = F.broadcast(firsts)
    gb = F.broadcast(g.select("gpos"))
    vocab = (
        ckpt.join(fb, F.col("fp") <= F.col("n"), "left")
        .groupBy("n")
        .agg(F.count("fp").alias("vocab"))
    )
    ntok = (
        ckpt.join(gb, F.col("gpos") <= F.col("n"), "left")
        .groupBy("n")
        .agg(F.count("gpos").alias("n_tokens"))
    )
    return (
        vocab.join(ntok, "n")
        .select(
            "n",
            F.col("vocab").cast("long").alias("vocab"),
            F.col("n_tokens").cast("long").alias("n_tokens"),
        )
        .orderBy("n")
    )


# ------------------------------------------------ optimal line breaks


@register_extra(
    "optimal_line_breaks",
    """
    WITH RECURSIVE dd AS (
      SELECT doc_id,
             list_slice(list_filter(string_split(text, ' '),
                                    t -> t <> ''), 1, 20) AS ws
      FROM documents
      WHERE ('0x' || substr(md5('lbk:' || CAST(doc_id AS VARCHAR)),
                            1, 4))::BIGINT % 9 = 0
    ),
    pl AS (
      SELECT doc_id, len(ws) AS n,
             [CAST(0 AS BIGINT)]
               || list_transform(ws, (w, i) ->
                    CAST(list_sum(list_transform(
                      list_slice(ws, 1, i), x -> length(x)))
                      AS BIGINT)) AS pre
      FROM dd WHERE len(ws) > 0
    ),
    st(doc_id, i, dp) AS (
      SELECT doc_id, CAST(0 AS BIGINT), [CAST(0 AS BIGINT)]
      FROM pl
      UNION ALL
      SELECT s1.doc_id, s1.i,
             s1.dp || [list_min(list_transform(s1.dp, (x, jj) ->
               x + CASE
                 WHEN s1.pre[CAST(s1.i + 1 AS INT)]
                      - s1.pre[jj] + (s1.i - jj) > 24
                 THEN CAST(1000000000 AS BIGINT)
                 WHEN s1.i = s1.n THEN CAST(1 AS BIGINT)
                 ELSE (24 - (s1.pre[CAST(s1.i + 1 AS INT)]
                             - s1.pre[jj] + (s1.i - jj)))
                      * (24 - (s1.pre[CAST(s1.i + 1 AS INT)]
                               - s1.pre[jj] + (s1.i - jj)))
                      * 64 + 1
               END))]
      FROM (
        SELECT st.doc_id, st.i + 1 AS i, st.dp, pl.pre, pl.n
        FROM st JOIN pl USING (doc_id)
        WHERE st.i < pl.n
      ) s1
    )
    SELECT p.doc_id, CAST(p.n AS BIGINT) AS n_words,
           CAST(f.v // 64 AS BIGINT) AS min_badness,
           CAST(f.v % 64 AS BIGINT) AS n_lines
    FROM pl p
    JOIN (SELECT doc_id, dp[len(dp)] AS v
          FROM (SELECT doc_id, dp,
                       row_number() OVER (PARTITION BY doc_id
                                          ORDER BY i DESC) AS rn
                FROM st) WHERE rn = 1) f USING (doc_id)
    ORDER BY p.doc_id
    """,
)
def optimal_line_breaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Optimal line breaking (Knuth-Plass badness DP, unit costs) —
    minimize the sum of squared slack over all lines at width 24 (last
    line free), the same DP a training pipeline runs to CHUNK text
    optimally under a token budget instead of greedy splitting.
    Secondary objective packed additively into the cost (badness*64 +
    1 per line), so min, badness, and line count are one integer
    lattice on both engines; overfull lines priced at 1e9. Spark runs
    the O(n^2) DP per doc vectorized in applyInPandas (docs are the
    parallel axis); the oracle replays it as a recursive list machine
    over the prefix-sum table. 20-word cap; md5 doc sample."""
    d = (
        _t(spark, sf_dir, "documents")
        .filter(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("lbk:"), F.col("doc_id").cast("string")
                        ).cast("binary")
                    ),
                    1,
                    4,
                ),
                16,
                10,
            ).cast("long")
            % 9
            == 0
        )
        .select(
            "doc_id",
            F.slice(
                F.filter(F.split("text", " "), lambda x: x != ""), 1, 20
            ).alias("ws"),
        )
        .filter(F.size("ws") > 0)
    )

    def _dp(key, pdf):
        import numpy as np
        import pandas as pd

        ws = list(pdf["ws"].iloc[0])
        n = len(ws)
        pre = np.zeros(n + 1, dtype=np.int64)
        for i, w in enumerate(ws):
            pre[i + 1] = pre[i] + len(w)
        BIG = 1000000000
        dp = np.zeros(n + 1, dtype=np.int64)
        for i in range(1, n + 1):
            j = np.arange(i)
            ll = pre[i] - pre[j] + (i - j - 1)
            cost = np.where(
                ll > 24,
                BIG,
                1 if i == n else 0,
            ).astype(np.int64)
            if i < n:
                bad = (24 - ll) * (24 - ll) * 64 + 1
                cost = np.where(ll > 24, BIG, bad)
            dp[i] = (dp[:i] + cost).min()
        v = int(dp[n])
        return pd.DataFrame(
            [(int(key[0]), n, v // 64, v % 64)],
            columns=["doc_id", "n_words", "min_badness", "n_lines"],
        )

    return (
        d.groupBy("doc_id")
        .applyInPandas(
            _dp,
            "doc_id long, n_words long, min_badness long, n_lines long",
        )
        .orderBy("doc_id")
    )


# -------------------------------------------------- mojibake detection

# The classic web-corpus encoding defect: UTF-8 bytes re-decoded as
# Latin-1 ("café" -> "cafÃ©"), the #1 cleanup CCNet/C4-style pipelines
# apply before training. The engine detects it with the lead-byte
# signature regex, repairs by the inverse transcode, and proves the
# repair byte-exact. The oracle builds the SAME corruption without any
# charset machinery — pure codepoint arithmetic (UTF-8 bytes 0xC3 0xA9
# reinterpreted as Latin-1 ARE codepoints U+00C3 U+00A9), so Spark's
# JVM encode/decode path is cross-derived against chr()-level math,
# and the md5 column pins the corrupted text byte-for-byte.
_MOJIBAKE_ORACLE = """
WITH d AS (
  SELECT doc_id, text || ' café straße français' AS accented,
         doc_id % 3 = 0 AS is_corrupted
  FROM documents
),
c AS (
  SELECT doc_id, is_corrupted,
         CASE WHEN is_corrupted THEN
           replace(replace(replace(accented,
             'é', chr(195) || chr(169)),
             'ß', chr(195) || chr(159)),
             'ç', chr(195) || chr(167))
         ELSE accented END AS shown
  FROM d
)
SELECT doc_id, is_corrupted,
       CAST(length(regexp_extract_all(
           shown,
           '[\\x{00C2}\\x{00C3}][\\x{0080}-\\x{00BF}]')) AS INT)
         AS moji_hits,
       md5(shown) AS moji_md5,
       true AS repaired_ok
FROM c
"""


@register_extra("mojibake_repair_audit", _MOJIBAKE_ORACLE)
def mojibake_repair_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Detect and repair UTF-8/Latin-1 double-encoding (mojibake) across
    the corpus: every third document is corrupted by the real transcode
    (encode UTF-8, re-decode as ISO-8859-1 — the exact bug that produces
    'cafÃ©' on the web), detection counts lead-byte signatures
    ([ÂÃ] + continuation), and repair applies the inverse transcode with
    a byte-exact equality proof against the original.

    Everything is JVM-side Catalyst expressions (encode/decode/
    regexp_count/md5) — no Python touches a row and no shuffle exists
    in the plan; at 100 TB this is a pure map pass whose output is one
    ~50-byte row per document."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    accented = F.concat(F.col("text"), F.lit(" café straße français"))
    is_corr = (F.col("doc_id") % 3) == 0
    corrupted = F.decode(F.encode(accented, "UTF-8"), "ISO-8859-1")
    shown = F.when(is_corr, corrupted).otherwise(accented)
    repaired = F.when(
        is_corr, F.decode(F.encode(shown, "ISO-8859-1"), "UTF-8")
    ).otherwise(shown)
    return docs.select(
        "doc_id",
        is_corr.alias("is_corrupted"),
        F.regexp_count(
            shown, F.lit("[\\u00C2\\u00C3][\\u0080-\\u00BF]")
        ).cast("int").alias("moji_hits"),
        F.md5(F.encode(shown, "UTF-8")).alias("moji_md5"),
        (repaired == accented).alias("repaired_ok"),
    )


# ------------------------------------------------- FM-index search

# FM-index backward search (Ferragina & Manzini 2000) — substring
# counting that reads ONLY the index (BWT + per-char prefix counts C +
# occ table), never the text: the machinery under bowtie/bwa and
# compressed search generally, and the natural next stage after the
# gated bwt_run_stats row. Engine: per doc, suffixes via
# sentinel-terminated rotations (window rank), dense occ(c, i) via an
# (alphabet x position) flag window-sum (i = 0 rows included so
# occ(c, sp-1) lookups never fall off the table), then the 3-char
# pattern descends with TWO chained (doc, char, i) equi-joins — the
# sharded-index search shape (each shard owns its occ/C; a k-char
# query is k lookups, independent of text size). Oracle: a plain
# position scan over the RAW text — it never builds the index, the
# engine never scans the text, they meet only at the count.
_FM_ORACLE = """
WITH dd AS (
  SELECT doc_id, substr(text, 1, 24) AS t,
         length(substr(text, 1, 24)) AS tl
  FROM documents
  WHERE strlen(text) = length(text)
    AND NOT contains(substr(text, 1, 24), '#')
    AND length(substr(text, 1, 24)) >= 16
    AND ('0x' || substr(md5('fm:' || CAST(doc_id AS VARCHAR)),
                        1, 4))::BIGINT % 11 = 0
),
probes AS (
  SELECT DISTINCT doc_id, t, tl, pat FROM (
    SELECT doc_id, t, tl, substr(t, 5, 3) AS pat FROM dd
    UNION ALL
    SELECT doc_id, t, tl, substr(t, 11, 3) AS pat FROM dd
    UNION ALL
    SELECT doc_id, t, tl, 'qzj' AS pat FROM dd
  )
),
hits AS (
  SELECT p.doc_id, p.pat, count(*) FILTER (
           WHERE substr(p.t, CAST(u.i AS INT), 3) = p.pat) AS n
  FROM probes p,
       unnest(range(1, CAST(p.tl AS BIGINT) - 1)) u(i)
  GROUP BY p.doc_id, p.pat
)
SELECT doc_id, pat AS pattern, CAST(n AS BIGINT) AS n_occ,
       n > 0 AS found
FROM hits ORDER BY doc_id, pattern
"""


@register_extra("fm_index_search", _FM_ORACLE)
def fm_index_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FM-index backward search (see oracle comment). Three probes per
    sampled doc: two 3-grams cut from the doc's own text (guaranteed
    present) and one fixed rare gram — so the descent exercises both
    the hit and the empty-interval paths. Everything is JVM string /
    window / join algebra; sentinel '#' is excluded from the corpus
    sample up front (both engines, same predicate)."""
    d = (
        _t(spark, sf_dir, "documents")
        .filter(F.octet_length("text") == F.length("text"))
        .filter(~F.substring("text", 1, 24).contains("#"))
        .filter(F.length(F.substring("text", 1, 24)) >= 16)
        .filter(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("fm:"), F.col("doc_id").cast("string")
                        ).cast("binary")
                    ),
                    1,
                    4,
                ),
                16,
                10,
            ).cast("long")
            % 11
            == 0
        )
        .select(
            "doc_id",
            F.substring("text", 1, 24).alias("t"),
            F.length(F.substring("text", 1, 24)).alias("tl"),
        )
        .withColumn("ts", F.concat(F.col("t"), F.lit("#")))
        .withColumn("n", F.col("tl") + 1)
        .localCheckpoint(eager=True)
    )
    # suffix order via sentinel rotations; bc = BWT char at rank r
    rots = d.select(
        "doc_id",
        "n",
        F.explode(F.sequence(F.lit(0), F.col("n") - 1)).alias("k"),
        "ts",
    ).select(
        "doc_id",
        "n",
        "k",
        F.expr("concat(substring(ts, k + 1, 25), substring(ts, 1, k))").alias(
            "rot"
        ),
    )
    wr = Window.partitionBy("doc_id").orderBy("rot")
    bwt = rots.select(
        "doc_id",
        "n",
        F.row_number().over(wr).alias("r"),
        F.expr("substring(rot, n, 1)").alias("bc"),
    ).localCheckpoint(eager=True)
    # per-doc char histogram of ts -> counts and exclusive prefix C[c]
    hist = bwt.groupBy("doc_id", F.col("bc").alias("c")).agg(
        F.count("*").alias("cnt")
    )
    wc = (
        Window.partitionBy("doc_id")
        .orderBy("c")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cdf = hist.withColumn(
        "cbelow", F.coalesce(F.sum("cnt").over(wc), F.lit(0))
    ).localCheckpoint(eager=True)
    # dense occ(c, i) for every alphabet char x position 0..n
    grid = (
        bwt.select("doc_id", "r", "bc")
        .join(cdf.select("doc_id", "c"), "doc_id")
        .withColumn("flag", (F.col("bc") == F.col("c")).cast("long"))
    )
    wo = Window.partitionBy("doc_id", "c").orderBy("r")
    occ_pos = grid.select(
        "doc_id", "c", F.col("r").alias("i"), F.sum("flag").over(wo).alias("occ")
    )
    occ0 = cdf.select(
        "doc_id", "c", F.lit(0).alias("i"), F.lit(0).cast("long").alias("occ")
    )
    occ = occ_pos.unionByName(occ0).localCheckpoint(eager=True)
    # probes: two present 3-grams + one rare constant
    probes = (
        d.select(
            "doc_id", F.expr("substring(t, 5, 3)").alias("pat")
        )
        .unionByName(
            d.select("doc_id", F.expr("substring(t, 11, 3)").alias("pat"))
        )
        .unionByName(d.select("doc_id", F.lit("qzj").alias("pat")))
        .distinct()  # a doc's two cut grams can coincide; the oracle
        # GROUPs BY (doc, pat), so the engine dedupes identically
        .withColumn("c1", F.expr("substring(pat, 1, 1)"))
        .withColumn("c2", F.expr("substring(pat, 2, 1)"))
        .withColumn("c3", F.expr("substring(pat, 3, 1)"))
    )
    # init on last char: [C[c3]+1, C[c3]+cnt[c3]]
    st0 = probes.join(
        cdf.select(
            "doc_id", F.col("c").alias("c3"), "cbelow", "cnt"
        ),
        ["doc_id", "c3"],
        "left",
    ).select(
        "doc_id",
        "pat",
        "c1",
        "c2",
        (F.col("cbelow") + 1).alias("sp"),
        (F.col("cbelow") + F.col("cnt")).alias("ep"),
    )

    def _step(state, ch_col):
        alive = state.filter(
            F.col("sp").isNotNull()
            & F.col("ep").isNotNull()
            & (F.col("ep") >= F.col("sp"))
        )
        dead = state.filter(
            F.col("sp").isNull()
            | F.col("ep").isNull()
            | (F.col("ep") < F.col("sp"))
        ).select(
            "doc_id",
            "pat",
            "c1",
            "c2",
            F.lit(None).cast("long").alias("sp"),
            F.lit(None).cast("long").alias("ep"),
        )
        o1 = occ.select(
            F.col("doc_id").alias("_d1"),
            F.col("c").alias("_ch1"),
            F.col("i").alias("_i1"),
            F.col("occ").alias("_osp"),
        )
        o2 = occ.select(
            F.col("doc_id").alias("_d2"),
            F.col("c").alias("_ch2"),
            F.col("i").alias("_i2"),
            F.col("occ").alias("_oep"),
        )
        cd = cdf.select(
            F.col("doc_id").alias("_dc"),
            F.col("c").alias("_chc"),
            F.col("cbelow").alias("_cb"),
        )
        nxt = (
            alive.join(
                cd,
                (F.col("_dc") == F.col("doc_id"))
                & (F.col("_chc") == F.col(ch_col)),
                "left",
            )
            .join(
                o1,
                (F.col("_d1") == F.col("doc_id"))
                & (F.col("_ch1") == F.col(ch_col))
                & (F.col("_i1") == F.col("sp") - 1),
                "left",
            )
            .join(
                o2,
                (F.col("_d2") == F.col("doc_id"))
                & (F.col("_ch2") == F.col(ch_col))
                & (F.col("_i2") == F.col("ep")),
                "left",
            )
            .select(
                "doc_id",
                "pat",
                "c1",
                "c2",
                F.when(
                    F.col("_cb").isNotNull(),
                    F.col("_cb") + F.coalesce(F.col("_osp"), F.lit(0)) + 1,
                )
                .cast("long")
                .alias("sp"),
                F.when(
                    F.col("_cb").isNotNull(),
                    F.col("_cb") + F.coalesce(F.col("_oep"), F.lit(0)),
                )
                .cast("long")
                .alias("ep"),
            )
        )
        return nxt.unionByName(dead)

    st1 = _step(st0, "c2")
    st2 = _step(st1, "c1")
    return (
        st2.select(
            "doc_id",
            F.col("pat").alias("pattern"),
            F.when(
                F.col("sp").isNotNull() & (F.col("ep") >= F.col("sp")),
                F.col("ep") - F.col("sp") + 1,
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("n_occ"),
        )
        .withColumn("found", F.col("n_occ") > 0)
        .orderBy("doc_id", "pattern")
    )


# ---------------------------------------------- Liang hyphenation

# Liang's pattern hyphenation (TeX82's algorithm): competing patterns
# with interleaved digits vote on every inter-letter gap of the
# boundary-dotted word; the MAX digit wins per gap and ODD means
# break. Patterns here are a small self-defined set (the algorithm,
# not Knuth's pattern corpus, is what's under test); lefthyphenmin =
# righthyphenmin = 2 as in TeX. The pattern list is decomposed ONCE
# in Python into (skeleton, [(gap_offset, digit)...]) and embedded in
# BOTH engines — Spark as literal structs, DuckDB as VALUES — so the
# matching itself is the only computation either side performs.
_HYPH_PATTERNS = [
    ".c2u", "s1t", "t2o", "o1r", "r1g", "1ta", "a1b", "e2c", "1do",
    "u1e", "n1d", "i1n", "2dow", "l1t", "e1am", "m1er", "a1t", "u1m",
    "r2y", "o1w", "t1r",
]


def _hyph_decompose() -> list[tuple[str, list[tuple[int, int]]]]:
    out = []
    for p in _HYPH_PATTERNS:
        skel, votes, nletters = "", [], 0
        for ch in p:
            if ch.isdigit():
                votes.append((nletters, int(ch)))
            else:
                skel += ch
                nletters += 1
        out.append((skel, votes))
    return out


def _hyph_oracle() -> str:
    rows = ",".join(
        f"('{skel}',{off},{d},{len(skel)})"
        for skel, votes in _hyph_decompose()
        for off, d in votes
    )
    return f"""
WITH pat(skel, off, d, m) AS (VALUES {rows}),
w0 AS (
  SELECT DISTINCT lower(u.tok) AS word
  FROM documents d,
       unnest(string_split(d.text, ' ')) u(tok)
  WHERE strlen(d.text) = length(d.text)
    AND length(u.tok) >= 4
    AND regexp_matches(lower(u.tok), '^[a-z]+$')
),
w AS (
  SELECT word, '.' || word || '.' AS dw,
         length(word) AS wl
  FROM w0
),
m AS (
  SELECT w.word, w.wl, pat.off + s.s - 1 AS gap, pat.d
  FROM w CROSS JOIN pat
  JOIN (SELECT unnest(generate_series(1, 16)) AS s) s
    ON s.s + pat.m - 1 <= w.wl + 2
  WHERE substr(w.dw, CAST(s.s AS INT), CAST(pat.m AS INT)) = pat.skel
),
v AS (
  SELECT word, wl, gap, max(d) AS md FROM m GROUP BY 1, 2, 3
),
h AS (
  SELECT word, wl,
         count(*) FILTER (WHERE md % 2 = 1 AND gap - 1 >= 2
                          AND gap - 1 <= wl - 2) AS n_points,
         COALESCE(sum(CASE WHEN md % 2 = 1 AND gap - 1 >= 2
                           AND gap - 1 <= wl - 2
                      THEN CAST(1 AS BIGINT) << CAST(gap - 1 AS INT)
                      ELSE 0 END), 0) AS hyphen_mask
  FROM v GROUP BY 1, 2
)
SELECT w.word AS word, CAST(w.wl AS INT) AS wl,
       CAST(COALESCE(h.n_points, 0) AS INT) AS n_points,
       CAST(COALESCE(h.hyphen_mask, 0) AS BIGINT) AS hyphen_mask
FROM w LEFT JOIN h ON h.word = w.word
ORDER BY w.word
"""


@register_extra("liang_hyphenation", _hyph_oracle())
def liang_hyphenation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Liang pattern hyphenation over the document vocabulary (see
    oracle comment) — the dictionary-free break-point stage feeding
    the gated Knuth-Plass optimal line breaker. Plan: vocabulary
    collapse first (distinct words, Heaps-law sized — patterns never
    see the corpus), then pattern matching is a bounded fanout
    (16 patterns x <=16 offsets) with a substring-equality filter in
    codegen, one (word, gap) max partial agg, and a per-word bitmask
    rollup. Dotted-coordinate gap accounting and TeX's 2/2 hyphenmin
    rule are identical literals on both sides."""
    pats = _hyph_decompose()
    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.octet_length("text") == F.length("text"))
        .select(F.explode(F.split(F.col("text"), " ")).alias("tok"))
        .select(F.lower(F.col("tok")).alias("word"))
        .filter(
            (F.length("word") >= 4) & F.col("word").rlike("^[a-z]+$")
        )
        .distinct()
        .withColumn("dw", F.concat(F.lit("."), F.col("word"), F.lit(".")))
        .withColumn("wl", F.length("word"))
    )
    pat_arr = F.array(
        *[
            F.struct(
                F.lit(skel).alias("skel"),
                F.lit(len(skel)).alias("m"),
                F.lit(off).alias("off"),
                F.lit(d).alias("d"),
            )
            for skel, votes in pats
            for off, d in votes
        ]
    )
    m = (
        docs.select("word", "wl", "dw", F.explode(pat_arr).alias("p"))
        .select(
            "word",
            "wl",
            "dw",
            "p",
            F.explode(F.sequence(F.lit(1), F.lit(16))).alias("s"),
        )
        .filter(F.col("s") + F.col("p.m") - 1 <= F.col("wl") + 2)
        .filter(
            F.expr("substring(dw, s, p.m)") == F.col("p.skel")
        )
        .select(
            "word",
            "wl",
            (F.col("p.off") + F.col("s") - 1).alias("gap"),
            F.col("p.d").alias("d"),
        )
    )
    v = m.groupBy("word", "wl", "gap").agg(F.max("d").alias("md"))
    odd = (
        (F.col("md") % 2 == 1)
        & (F.col("gap") - 1 >= 2)
        & (F.col("gap") - 1 <= F.col("wl") - 2)
    )
    h = v.groupBy("word", "wl").agg(
        F.count(F.when(odd, 1)).alias("n_points"),
        F.coalesce(
            F.sum(
                F.when(
                    odd,
                    F.expr("cast(1 as bigint) << cast(gap - 1 as int)"),
                ).otherwise(F.lit(0))
            ),
            F.lit(0),
        ).alias("hyphen_mask"),
    )
    return (
        docs.select("word", "wl")
        .join(h.select("word", "n_points", "hyphen_mask"), "word", "left")
        .select(
            "word",
            F.col("wl").cast("int"),
            F.coalesce(F.col("n_points"), F.lit(0)).cast("int").alias("n_points"),
            F.coalesce(F.col("hyphen_mask"), F.lit(0))
            .cast("long")
            .alias("hyphen_mask"),
        )
        .orderBy("word")
    )


# ---------------------------------------------- inverse BWT (Wyllie)

# Inverse Burrows-Wheeler transform as DATAFLOW — closing the bzip2
# family loop (bwt_run_stats / mtf / rle / huffman rows are the
# forward path). The LF mapping is a single n-cycle permutation over
# BWT ranks; recovering the text is exactly the LIST-RANKING problem,
# solved here by Wyllie pointer doubling: ceil(log2 n) self-join
# rounds give every rank its step index on the cycle, chars assemble
# by position, and the sentinel rotation ('#' appended before the
# transform; its position need not be rank 1 since '#' > ' ' in
# binary order) unrotates the result. The inversion path reads ONLY
# (rank, char, LF) — never the text; the oracle IS the text
# (inverse(bwt(t)) == t by definition), so every recovered byte is
# hash-fatal.
_IBWT_ORACLE = """
SELECT doc_id, substr(text, 1, 24) AS recovered
FROM documents
WHERE strlen(text) = length(text)
  AND NOT contains(substr(text, 1, 24), '#')
  AND length(substr(text, 1, 24)) >= 16
  AND ('0x' || substr(md5('ib:' || CAST(doc_id AS VARCHAR)),
                      1, 4))::BIGINT % 7 = 0
ORDER BY doc_id
"""


@register_extra("inverse_bwt_ranking", _IBWT_ORACLE)
def inverse_bwt_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse BWT via Wyllie list ranking (see oracle comment). Five
    doubling rounds bound any 25-char cycle; each round is one
    (doc, rank)-key equi-join of the pointer state with itself —
    the O(log n) depth, O(n log n) work classic that makes linked
    structures rankable as dataflow at any scale."""
    d = (
        _t(spark, sf_dir, "documents")
        .filter(F.octet_length("text") == F.length("text"))
        .filter(~F.substring("text", 1, 24).contains("#"))
        .filter(F.length(F.substring("text", 1, 24)) >= 16)
        .filter(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("ib:"), F.col("doc_id").cast("string")
                        ).cast("binary")
                    ),
                    1,
                    4,
                ),
                16,
                10,
            ).cast("long")
            % 7
            == 0
        )
        .select(
            "doc_id",
            F.substring("text", 1, 24).alias("t"),
        )
        .withColumn("ts", F.concat(F.col("t"), F.lit("#")))
        .withColumn("n", F.length("ts"))
        .localCheckpoint(eager=True)
    )
    rots = d.select(
        "doc_id",
        "n",
        F.explode(F.sequence(F.lit(0), F.col("n") - 1)).alias("k"),
        "ts",
    ).select(
        "doc_id",
        "n",
        F.expr("concat(substring(ts, k + 1, 25), substring(ts, 1, k))").alias(
            "rot"
        ),
    )
    wr = Window.partitionBy("doc_id").orderBy("rot")
    bwt = rots.select(
        "doc_id",
        "n",
        F.row_number().over(wr).alias("r"),
        F.expr("substring(rot, n, 1)").alias("bc"),
    )
    # LF(r) = C[bc] + occ(bc, r): exclusive char prefix + in-char rank
    # rank by (bc, r) = cbelow + run, so LF = cbelow + run = that rank
    wsort = Window.partitionBy("doc_id").orderBy("bc", "r")
    wocc = Window.partitionBy("doc_id", "bc").orderBy("r")
    lf = (
        bwt.withColumn("run", F.row_number().over(wocc))
        .withColumn("succ", F.row_number().over(wsort))
        .select("doc_id", "n", "r", "bc", "succ")
        .localCheckpoint(eager=True)
    )
    # Wyllie init: node 1 absorbs (self-loop, d = 0)
    state = lf.select(
        "doc_id",
        "n",
        "r",
        "bc",
        F.when(F.col("r") == 1, F.lit(1)).otherwise(F.col("succ")).alias("ptr"),
        F.when(F.col("r") == 1, F.lit(0)).otherwise(F.lit(1)).alias("d"),
    )
    for _ in range(5):  # 2^5 = 32 >= n = 25
        other = state.select(
            F.col("doc_id").alias("_dd"),
            F.col("r").alias("_r"),
            F.col("ptr").alias("_ptr"),
            F.col("d").alias("_d"),
        )
        state = (
            state.join(
                other,
                (F.col("_dd") == F.col("doc_id"))
                & (F.col("_r") == F.col("ptr")),
            )
            .select(
                "doc_id",
                "n",
                "r",
                "bc",
                F.col("_ptr").alias("ptr"),
                (F.col("d") + F.col("_d")).alias("d"),
            )
            .localCheckpoint(eager=True)
        )
    # step index on the cycle from rank 1; char lands at position n-1-step
    chars = state.select(
        "doc_id",
        "n",
        "bc",
        ((F.col("n") - F.col("d")) % F.col("n")).alias("step"),
    ).select(
        "doc_id", "bc", (F.col("n") - 1 - F.col("step")).alias("p")
    )
    rec = chars.groupBy("doc_id").agg(
        F.expr(
            "concat_ws('', transform(array_sort(collect_list(struct(p, bc))),"
            " s -> s.bc))"
        ).alias("raw")
    )
    return (
        rec.select(
            "doc_id",
            F.expr(
                "concat(substring(raw, instr(raw, '#') + 1),"
                " substring(raw, 1, instr(raw, '#') - 1))"
            ).alias("recovered"),
        )
        .orderBy("doc_id")
    )


# ------------------------------------------- Myers bit-parallel edit

# Myers' bit-parallel Levenshtein (1999; Hyyro's formulation) — the
# O(n * m/w) bit-vector trick inside agrep / modern fuzzy searchers:
# the DP column lives in two machine words (PV/MV carry the +1/-1
# deltas), each text character costs ~15 word ops regardless of
# pattern length <= 64. The ENGINE runs this from-scratch kernel; the
# oracle scores the same pairs with DuckDB's independent levenshtein()
# implementation — two unrelated algorithms, one hash-fatal number.
_MYERS_ORACLE = """
WITH d AS (
  SELECT doc_id, lang, substr(text, 1, 12) AS p, substr(text, 1, 24) AS t
  FROM documents
  WHERE strlen(text) = length(text)
    AND length(text) >= 24
    AND ('0x' || substr(md5('my:' || CAST(doc_id AS VARCHAR)),
                        1, 4))::BIGINT % 17 = 0
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(levenshtein(a.p, b.t) AS INT) AS dist
FROM d a JOIN d b ON b.lang = a.lang AND a.doc_id < b.doc_id
ORDER BY doc_a, doc_b
"""


def _myers_distance(p: str, t: str) -> int:
    """Bit-parallel Levenshtein distance (pattern <= 64 chars)."""
    m = len(p)
    if m == 0:
        return len(t)
    peq: dict = {}
    for i, ch in enumerate(p):
        peq[ch] = peq.get(ch, 0) | (1 << i)
    mask = (1 << m) - 1
    pv, mv, score = mask, 0, m
    hibit = 1 << (m - 1)
    for ch in t:
        eq = peq.get(ch, 0)
        xv = eq | mv
        xh = (((eq & pv) + pv) & mask ^ pv) | eq
        ph = mv | (~(xh | pv) & mask)
        mh = pv & xh
        if ph & hibit:
            score += 1
        elif mh & hibit:
            score -= 1
        ph = ((ph << 1) | 1) & mask
        mh = (mh << 1) & mask
        pv = mh | (~(xv | ph) & mask)
        mv = ph & xv
    return score


@register_extra("myers_bitparallel_edit", _MYERS_ORACLE)
def myers_bitparallel_edit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise edit distances via the from-scratch Myers bit-vector
    kernel over a sampled doc corpus (12-char patterns x 24-char
    texts; see oracle comment — DuckDB's own levenshtein() is the
    independent referee). Scale shape: pairs come from a (blockable)
    self-join and each pair costs O(|t|) word ops in an Arrow batch —
    the refine-stage kernel a fuzzy-join runs after blocking, 4-5x
    cheaper per pair than the DP matrix at these lengths and widening
    with pattern length."""
    import pandas as pd

    d = (
        _t(spark, sf_dir, "documents")
        .filter(F.octet_length("text") == F.length("text"))
        .filter(F.length("text") >= 24)
        .filter(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("my:"), F.col("doc_id").cast("string")
                        ).cast("binary")
                    ),
                    1,
                    4,
                ),
                16,
                10,
            ).cast("long")
            % 17
            == 0
        )
        .select(
            "doc_id",
            "lang",
            F.expr("substring(text, 1, 12)").alias("p"),
            F.expr("substring(text, 1, 24)").alias("t"),
        )
    )
    b = d.select(
        F.col("doc_id").alias("doc_b"),
        F.col("lang").alias("lang_b"),
        F.col("t").alias("tb"),
    )
    # block on lang (the equi-key makes the pair join hash-joinable —
    # never an all-pairs BNLJ; same blocking as edit_distance_blocked)
    pairs = d.select(F.col("doc_id").alias("doc_a"), "lang", "p").join(
        b,
        (F.col("lang_b") == F.col("lang")) & (F.col("doc_a") < F.col("doc_b")),
    )

    def _score(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_a": pdf["doc_a"],
                    "doc_b": pdf["doc_b"],
                    "dist": [
                        _myers_distance(p, t)
                        for p, t in zip(pdf["p"], pdf["tb"])
                    ],
                }
            )

    return (
        pairs.mapInPandas(_score, "doc_a long, doc_b long, dist int")
        .orderBy("doc_a", "doc_b")
    )


# ------------------------------------------------------- NDCG@10

# Graded-relevance ranking evaluation — the IR-eval metric missing
# beside the gated AP/AUC rows. Discount weights are FIXED-POINT
# LITERALS w_p = round(2^20 / log2(p+1)) shared by both engines (the
# DCT-table discipline: the only irrational in NDCG never crosses an
# engine as a float); gains are 2^rel - 1 over md5-graded relevance;
# ndcg_e6 = 1e6 * DCG // IDCG in exact integers.
_NDCG_W = (1048576, 661578, 524288, 451597, 405645, 373510, 349525,
           330789, 315653, 303106)


def _ndcg_oracle() -> str:
    wrows = ",".join(f"({p+1},{w})" for p, w in enumerate(_NDCG_W))
    return f"""
WITH w(pos, wt) AS (VALUES {wrows}),
ev AS (
  SELECT user_id % 40 AS q, event_id,
         ('0x' || substr(md5('sc:' || CAST(event_id AS VARCHAR)),
                         1, 6))::BIGINT % 1000 AS score,
         (1 << (('0x' || substr(md5('rel:' || CAST(event_id AS VARCHAR)),
                                1, 6))::BIGINT % 4)::INT) - 1 AS gain
  FROM events
),
sys AS (
  SELECT q, gain, row_number() OVER (PARTITION BY q
           ORDER BY score DESC, event_id) AS pos
  FROM ev
),
ideal AS (
  SELECT q, gain, row_number() OVER (PARTITION BY q
           ORDER BY gain DESC, event_id) AS pos
  FROM ev
),
dcg AS (SELECT s.q, sum(s.gain * w.wt) AS dcg
        FROM sys s JOIN w ON w.pos = s.pos GROUP BY s.q),
idcg AS (SELECT i.q, sum(i.gain * w.wt) AS idcg
         FROM ideal i JOIN w ON w.pos = i.pos GROUP BY i.q)
SELECT CAST(d.q AS INT) AS query_id,
       CAST(d.dcg AS BIGINT) AS dcg,
       CAST(i.idcg AS BIGINT) AS idcg,
       CAST(CASE WHEN i.idcg > 0 THEN 1000000 * d.dcg // i.idcg
            ELSE -1 END AS BIGINT) AS ndcg_e6
FROM dcg d JOIN idcg i ON i.q = d.q
ORDER BY query_id
"""


@register_extra("ndcg_ranking_eval", _ndcg_oracle())
def ndcg_ranking_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 per query over md5-scored rankings with graded
    relevance (see oracle comment). Two query-keyed ranking windows
    (system order, ideal order), one broadcast 10-row weight dim, two
    partial-agg sums — at 10^12 impressions this is the nightly
    ranking-eval job's exact shape."""
    from pyspark.sql import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    eid = F.col("event_id").cast("string")

    def _h(prefix: str) -> F.Column:
        return F.conv(
            F.substring(
                F.md5(F.concat(F.lit(prefix), eid).cast("binary")), 1, 6
            ),
            16,
            10,
        ).cast("long")

    base = ev.select(
        (F.col("user_id") % 40).alias("q"),
        "event_id",
        (_h("sc:") % 1000).alias("score"),
        _h("rel:").alias("_rel"),
    ).select(
        "q",
        "event_id",
        "score",
        (
            F.expr("shiftleft(1, cast(pmod(_rel, 4) as int)) - 1")
        ).alias("gain"),
    )
    wdim = spark.createDataFrame(
        [(p + 1, w) for p, w in enumerate(_NDCG_W)], "pos int, wt long"
    )
    wsys = Window.partitionBy("q").orderBy(F.col("score").desc(), "event_id")
    wideal = Window.partitionBy("q").orderBy(F.col("gain").desc(), "event_id")
    sys_r = base.withColumn("pos", F.row_number().over(wsys))
    ideal_r = base.withColumn("pos", F.row_number().over(wideal))
    dcg = (
        sys_r.join(F.broadcast(wdim), "pos")
        .groupBy("q")
        .agg(F.sum(F.col("gain") * F.col("wt")).alias("dcg"))
    )
    idcg = (
        ideal_r.join(F.broadcast(wdim), "pos")
        .groupBy("q")
        .agg(F.sum(F.col("gain") * F.col("wt")).alias("idcg"))
    )
    return (
        dcg.join(idcg, "q")
        .select(
            F.col("q").cast("int").alias("query_id"),
            F.col("dcg").cast("long"),
            F.col("idcg").cast("long"),
            F.when(
                F.col("idcg") > 0,
                F.expr("1000000 * dcg div idcg"),
            )
            .otherwise(F.lit(-1))
            .cast("long")
            .alias("ndcg_e6"),
        )
        .orderBy("query_id")
    )


# ------------------------------------------------- MMR diversity

# Maximal Marginal Relevance (Carbonell & Goldstein 1998) — the
# diversity reranker between retrieval and display: greedily pick the
# item maximizing lambda*rel - (1-lambda)*max-sim-to-selected. Run
# here with lambda = 1/2 in EXACT INTEGERS over int8-quantized
# embeddings (q_i = floor(double(e_i) * 127) — the identical IEEE op
# in both engines, after which every dot product is exact int64):
# score = 2*rel - max_sim, ties -> lowest vec_id, five rounds. The
# oracle unrolls the same greedy as five chained CTEs over a shared
# pairwise-dot relation; the engine loops five DataFrame rounds.
_MMR_ORACLE = """
WITH q AS (
  SELECT list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * 127) AS BIGINT)) AS qv
  FROM embeddings WHERE vec_id = 0
),
cand AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * 127) AS BIGINT)) AS v
  FROM embeddings
  WHERE vec_id > 0
    AND ('0x' || substr(md5('mm:' || CAST(vec_id AS VARCHAR)),
                        1, 4))::BIGINT % 12 = 0
),
cu AS (
  SELECT vec_id, generate_subscripts(v, 1) AS i, unnest(v) AS x
  FROM cand
),
qu AS (
  SELECT generate_subscripts(qv, 1) AS i, unnest(qv) AS x FROM q
),
rel AS (
  SELECT cu.vec_id, sum(cu.x * qu.x) AS r
  FROM cu JOIN qu USING (i) GROUP BY 1
),
dots AS (
  SELECT a.vec_id AS ia, b.vec_id AS ib, sum(a.x * b.x) AS d
  FROM cu a JOIN cu b ON b.i = a.i AND b.vec_id <> a.vec_id
  GROUP BY 1, 2
),
s1 AS (SELECT vec_id, r FROM rel ORDER BY r DESC, vec_id LIMIT 1),
r2 AS (
  SELECT rel.vec_id, 2 * rel.r - d.d AS score FROM rel
  JOIN s1 ON rel.vec_id <> s1.vec_id
  JOIN dots d ON d.ia = rel.vec_id AND d.ib = s1.vec_id
),
s2 AS (SELECT vec_id FROM r2 ORDER BY score DESC, vec_id LIMIT 1),
r3 AS (
  SELECT rel.vec_id, 2 * rel.r - max(d.d) AS score FROM rel
  JOIN dots d ON d.ia = rel.vec_id
             AND d.ib IN (SELECT vec_id FROM s1 UNION ALL
                          SELECT vec_id FROM s2)
  WHERE rel.vec_id NOT IN (SELECT vec_id FROM s1 UNION ALL
                           SELECT vec_id FROM s2)
  GROUP BY rel.vec_id, rel.r
),
s3 AS (SELECT vec_id FROM r3 ORDER BY score DESC, vec_id LIMIT 1),
r4 AS (
  SELECT rel.vec_id, 2 * rel.r - max(d.d) AS score FROM rel
  JOIN dots d ON d.ia = rel.vec_id
             AND d.ib IN (SELECT vec_id FROM s1 UNION ALL
                          SELECT vec_id FROM s2 UNION ALL
                          SELECT vec_id FROM s3)
  WHERE rel.vec_id NOT IN (SELECT vec_id FROM s1 UNION ALL
                           SELECT vec_id FROM s2 UNION ALL
                           SELECT vec_id FROM s3)
  GROUP BY rel.vec_id, rel.r
),
s4 AS (SELECT vec_id FROM r4 ORDER BY score DESC, vec_id LIMIT 1),
r5 AS (
  SELECT rel.vec_id, 2 * rel.r - max(d.d) AS score FROM rel
  JOIN dots d ON d.ia = rel.vec_id
             AND d.ib IN (SELECT vec_id FROM s1 UNION ALL
                          SELECT vec_id FROM s2 UNION ALL
                          SELECT vec_id FROM s3 UNION ALL
                          SELECT vec_id FROM s4)
  WHERE rel.vec_id NOT IN (SELECT vec_id FROM s1 UNION ALL
                           SELECT vec_id FROM s2 UNION ALL
                           SELECT vec_id FROM s3 UNION ALL
                           SELECT vec_id FROM s4)
  GROUP BY rel.vec_id, rel.r
),
s5 AS (SELECT vec_id FROM r5 ORDER BY score DESC, vec_id LIMIT 1),
sel AS (
  SELECT 1 AS rank, vec_id FROM s1
  UNION ALL SELECT 2, vec_id FROM s2
  UNION ALL SELECT 3, vec_id FROM s3
  UNION ALL SELECT 4, vec_id FROM s4
  UNION ALL SELECT 5, vec_id FROM s5
)
SELECT CAST(sel.rank AS INT) AS rank,
       CAST(sel.vec_id AS BIGINT) AS vec_id,
       CAST(rel.r AS BIGINT) AS relevance
FROM sel JOIN rel ON rel.vec_id = sel.vec_id
ORDER BY rank
"""


@register_extra("mmr_diversity_rerank", _MMR_ORACLE)
def mmr_diversity_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR top-5 over the quantized embedding sample (see oracle
    comment). Engine loop: five rounds, each one (remaining x
    selected) equi-join -> per-candidate max-sim partial agg -> global
    max(struct) argmax; the candidate set is broadcast-scale (a
    rerank operates on a retrieval page, not the corpus), the exact
    regime MMR is deployed in."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    quant = "transform(embedding, x -> cast(floor(cast(x as double) * 127) as bigint))"
    q = emb.filter(F.col("vec_id") == 0).select(F.expr(quant).alias("qv"))
    cand = (
        emb.filter(F.col("vec_id") > 0)
        .filter(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("mm:"), F.col("vec_id").cast("string")
                        ).cast("binary")
                    ),
                    1,
                    4,
                ),
                16,
                10,
            ).cast("long")
            % 12
            == 0
        )
        .select("vec_id", F.expr(quant).alias("v"))
        .localCheckpoint(eager=True)
    )
    dot = (
        "aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0L,"
        " (acc, t) -> acc + t)"
    )
    rel = cand.crossJoin(F.broadcast(q)).select(
        "vec_id", "v", F.expr(dot.format(a="v", b="qv")).alias("r")
    ).localCheckpoint(eager=True)
    selected = []  # list of (rank, vec_id, relevance) rows collected per round
    remaining = rel
    sel_df = None
    for rank in range(1, 6):
        if sel_df is None:
            scored = remaining.select(
                "vec_id", "r", (2 * F.col("r")).alias("score")
            )
        else:
            sims = (
                remaining.crossJoin(
                    F.broadcast(
                        sel_df.select(
                            F.col("vec_id").alias("sid"), F.col("v").alias("sv")
                        )
                    )
                )
                .select(
                    "vec_id",
                    "r",
                    F.expr(dot.format(a="v", b="sv")).alias("d"),
                )
                .groupBy("vec_id", "r")
                .agg(F.max("d").alias("maxsim"))
            )
            scored = sims.select(
                "vec_id", "r", (2 * F.col("r") - F.col("maxsim")).alias("score")
            )
        top = scored.orderBy(
            F.col("score").desc(), F.col("vec_id")
        ).limit(1)
        pick = remaining.join(
            top.select("vec_id"), "vec_id"
        ).localCheckpoint(eager=True)
        sel_df = pick if sel_df is None else sel_df.unionByName(pick).localCheckpoint(
            eager=True
        )
        selected.append(
            pick.select(
                F.lit(rank).cast("int").alias("rank"),
                F.col("vec_id").cast("long"),
                F.col("r").cast("long").alias("relevance"),
            )
        )
        remaining = remaining.join(
            top.select("vec_id"), "vec_id", "left_anti"
        ).localCheckpoint(eager=True)
    out = selected[0]
    for s in selected[1:]:
        out = out.unionByName(s)
    return out.orderBy("rank")


# ------------------------------------------------- Adler-32 checksums


@register_extra(
    "adler32_audit",
    """
    WITH dd AS (
      SELECT doc_id, text AS t, length(text) AS n
      FROM documents
      WHERE strlen(text) = length(text) AND length(text) > 0
        AND ('0x' || substr(md5('ad:' || CAST(doc_id AS VARCHAR)),
                            1, 4))::BIGINT % 5 = 0
    ),
    ch AS (
      SELECT doc_id, n, unnest(generate_series(1, n)) AS i, t
      FROM dd
    ),
    agg AS (
      SELECT doc_id, any_value(n) AS n,
             sum(ascii(substr(t, CAST(i AS INT), 1))) AS sb,
             sum((n - i + 1) * ascii(substr(t, CAST(i AS INT), 1))) AS wb
      FROM ch GROUP BY doc_id
    )
    SELECT doc_id, CAST(n AS BIGINT) AS n_bytes,
           CAST((1 + sb) % 65521 AS BIGINT) AS a_part,
           CAST((n + wb) % 65521 AS BIGINT) AS b_part,
           CAST(((n + wb) % 65521) * 65536 + (1 + sb) % 65521 AS BIGINT)
             AS adler32
    FROM agg ORDER BY doc_id
    """,
)
def adler32_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adler-32 (zlib RFC 1950) checksums computed in CLOSED FORM: the
    running-sum definition A_j = 1 + sum(b_i), B = sum(A_j) collapses
    to A = (1 + sum b_i) mod 65521, B = (n + sum (n-i+1) b_i) mod
    65521 — so unlike CRC-32 (a bitwise fold, see crc32_audit) the
    checksum is a pair of weighted SUMS. That makes it a pure
    aggregation: the Spark side runs zero-Python higher-order
    functions (transform/aggregate) inside whole-stage codegen with no
    shuffle at all (per-row result), and at 100 TB it parallelizes as
    embarrassingly-map work; the oracle re-derives the same sums
    relationally via position unnest. tests also referee the values
    against zlib.adler32 (the C implementation) — three independent
    derivations, one number. ASCII full-text docs, md5 1-in-5
    sample."""
    d = (
        _t(spark, sf_dir, "documents")
        .filter(
            (F.octet_length("text") == F.length("text"))
            & (F.length("text") > 0)
        )
        .filter(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("ad:"), F.col("doc_id").cast("string")
                        ).cast("binary")
                    ),
                    1,
                    4,
                ),
                16,
                10,
            ).cast("long")
            % 5
            == 0
        )
        .select("doc_id", F.col("text").alias("t"), F.length("text").alias("n"))
    )
    arr = "transform(split(t, ''), c -> CAST(ascii(c) AS BIGINT))"
    return d.select(
        "doc_id",
        F.col("n").cast("long").alias("n_bytes"),
        F.expr(
            f"(1 + aggregate({arr}, 0L, (acc, x) -> acc + x)) % 65521"
        ).alias("a_part"),
        F.expr(
            f"(n + aggregate({arr}, named_struct('i', 0L, 's', 0L),"
            " (acc, x) -> named_struct('i', acc.i + 1,"
            " 's', acc.s + (n - acc.i) * x), acc -> acc.s)) % 65521"
        ).alias("b_part"),
    ).withColumn(
        "adler32", (F.col("b_part") * 65536 + F.col("a_part")).cast("long")
    ).select(
        "doc_id",
        "n_bytes",
        F.col("a_part").cast("long"),
        F.col("b_part").cast("long"),
        "adler32",
    ).orderBy("doc_id")


# ------------------------------------------------ k-mer minimizers

_MNZ_K = 8   # k-mer length
_MNZ_W = 12  # window: w consecutive k-mers pick one minimizer


@register_extra(
    "kmer_minimizers",
    f"""
    WITH dd AS (
      SELECT doc_id, text AS t, length(text) - {_MNZ_K} + 1 AS nk
      FROM documents
      WHERE strlen(text) = length(text)
        AND length(text) >= {_MNZ_K + _MNZ_W}
    ),
    km AS (
      SELECT doc_id, nk, unnest(generate_series(1, nk)) AS pos, t
      FROM dd
    ),
    h AS (
      SELECT doc_id, nk, pos,
             ('0x' || substr(md5('km:' || substr(t, CAST(pos AS INT),
                                                 {_MNZ_K})),
                             1, 5))::BIGINT * 1024 + pos AS ck
      FROM km
    ),
    wmin AS (
      SELECT doc_id, nk, pos,
             min(ck) OVER (PARTITION BY doc_id ORDER BY pos
                           ROWS BETWEEN CURRENT ROW
                           AND {_MNZ_W - 1} FOLLOWING) AS mck
      FROM h
    ),
    sel AS (
      SELECT doc_id, any_value(nk) AS nk,
             count(*) AS n_windows,
             count(DISTINCT mck % 1024) AS n_minimizers
      FROM wmin WHERE pos <= nk - {_MNZ_W} + 1
      GROUP BY doc_id
    )
    SELECT doc_id, CAST(nk AS BIGINT) AS n_kmers,
           CAST(n_windows AS BIGINT) AS n_windows,
           CAST(n_minimizers AS BIGINT) AS n_minimizers,
           CAST(1000000 * n_minimizers // n_windows AS BIGINT)
             AS density_e6
    FROM sel ORDER BY doc_id
    """,
)
def kmer_minimizers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(w,k)-minimizer selection (Roberts 2004; the sampling scheme
    under minimap2/Kraken and modern near-dup shingling): every window
    of w consecutive k-mers keeps the k-mer with the smallest hash,
    leftmost-position tie-break — adjacent windows mostly agree, so
    ~2/(w+1) of positions survive as the document sketch. Exact
    cross-engine form: hash = first 5 md5 hex digits of the k-mer,
    argmin packed as hash*1024+pos (text <= 1023 chars) so one
    window-frame min IS the argmin; density reported as an e6 floor.
    Plan: one scan, one doc-partitioned sort window, partial-agg
    rollup — the standard sketch-build shape that at 100 TB is a
    single map-side pass per document partition."""
    d = (
        _t(spark, sf_dir, "documents")
        .filter(
            (F.octet_length("text") == F.length("text"))
            & (F.length("text") >= _MNZ_K + _MNZ_W)
        )
        .select(
            "doc_id",
            F.col("text").alias("t"),
            (F.length("text") - _MNZ_K + 1).alias("nk"),
        )
    )
    km = d.select(
        "doc_id",
        "nk",
        F.explode(F.sequence(F.lit(1), F.col("nk"))).alias("pos"),
        "t",
    )
    h = km.select(
        "doc_id",
        "nk",
        "pos",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("km:"),
                            F.expr(f"substr(t, pos, {_MNZ_K})"),
                        ).cast("binary")
                    ),
                    1,
                    5,
                ),
                16,
                10,
            ).cast("long")
            * 1024
            + F.col("pos")
        ).alias("ck"),
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.currentRow, _MNZ_W - 1)
    )
    wmin = h.select(
        "doc_id", "nk", "pos", F.min("ck").over(w).alias("mck")
    ).filter(F.col("pos") <= F.col("nk") - _MNZ_W + 1)
    return (
        wmin.groupBy("doc_id")
        .agg(
            F.first("nk").alias("nk"),
            F.count(F.lit(1)).alias("n_windows"),
            F.countDistinct(F.col("mck") % 1024).alias("n_minimizers"),
        )
        .select(
            "doc_id",
            F.col("nk").cast("long").alias("n_kmers"),
            F.col("n_windows").cast("long"),
            F.col("n_minimizers").cast("long"),
            F.expr("CAST(1000000 * n_minimizers div n_windows AS BIGINT)")
            .alias("density_e6"),
        )
        .orderBy("doc_id")
    )


# ------------------------------------------------- BLEU components

# BLEU (Papineni 2002) with exact arithmetic: candidate = the document
# with every 5th word (md5-gated) dropped, reference = the original.
# For n = 1..4 the modified (clipped) precision p_n = sum_g min(
# cand_count(g), ref_count(g)) / n_cand_ngrams rides as an exact
# rational; the geometric-mean core is reported as the exact product
# prod p_n (a monotone transform of BLEU without the 1/4 root, so
# ordering is preserved) floored at e6, and the brevity penalty's
# inputs (cand/ref lengths) are exact integers — only exp(1 - r/c)
# itself is left to the reader, keeping every cross-engine number
# integral. ROUGE-L lives in rouge_lcs_pairs; this completes the MT
# evaluation pair.
_BLEU_ORACLE = """
WITH dd AS MATERIALIZED (
  SELECT doc_id, lower(text) AS t FROM documents
  WHERE strlen(text) = length(text)
),
tok AS MATERIALIZED (
  SELECT doc_id, i::BIGINT AS pos, w
  FROM (
    SELECT doc_id, unnest(string_split_regex(trim(t), '\\s+')) AS w,
           unnest(generate_series(1,
             len(string_split_regex(trim(t), '\\s+')))) AS i
    FROM dd
  ) WHERE w <> ''
),
cand AS MATERIALIZED (
  SELECT doc_id, pos, w,
         row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS cpos
  FROM tok
  WHERE ('0x' || substr(md5('bd:' || CAST(doc_id AS VARCHAR) || ':'
                            || CAST(pos AS VARCHAR)), 1, 4))::BIGINT
        % 5 <> 0
),
grams AS MATERIALIZED (
  SELECT * FROM (
    SELECT 'c' AS side, doc_id, n.n,
           concat_ws(' ', w,
             lead(w, 1) OVER wo, lead(w, 2) OVER wo,
             lead(w, 3) OVER wo) AS g4,
           lead(w, 3) OVER wo AS w4, lead(w, 2) OVER wo AS w3,
           lead(w, 1) OVER wo AS w2, w AS w1, cpos AS p
    FROM cand CROSS JOIN (SELECT unnest([1, 2, 3, 4]) AS n) n
    WINDOW wo AS (PARTITION BY doc_id, n.n ORDER BY cpos)
    UNION ALL
    SELECT 'r', doc_id, n.n,
           concat_ws(' ', w,
             lead(w, 1) OVER wo2, lead(w, 2) OVER wo2,
             lead(w, 3) OVER wo2),
           lead(w, 3) OVER wo2, lead(w, 2) OVER wo2,
           lead(w, 1) OVER wo2, w, pos
    FROM tok CROSS JOIN (SELECT unnest([1, 2, 3, 4]) AS n) n
    WINDOW wo2 AS (PARTITION BY doc_id, n.n ORDER BY pos)
  )
),
ng AS MATERIALIZED (
  SELECT side, doc_id, n,
         CASE n WHEN 1 THEN w1
                WHEN 2 THEN concat_ws(' ', w1, w2)
                WHEN 3 THEN concat_ws(' ', w1, w2, w3)
                ELSE g4 END AS gram
  FROM grams
  WHERE (n = 1)
     OR (n = 2 AND w2 IS NOT NULL)
     OR (n = 3 AND w3 IS NOT NULL)
     OR (n = 4 AND w4 IS NOT NULL)
),
cnt AS MATERIALIZED (
  SELECT doc_id, n, gram,
         sum(CASE WHEN side = 'c' THEN 1 ELSE 0 END) AS cc,
         sum(CASE WHEN side = 'r' THEN 1 ELSE 0 END) AS rc
  FROM ng GROUP BY 1, 2, 3
),
prec AS MATERIALIZED (
  SELECT doc_id, n, sum(least(cc, rc)) AS clip, sum(cc) AS tot
  FROM cnt GROUP BY 1, 2
),
lens AS MATERIALIZED (
  SELECT t.doc_id, count(*) AS rlen, count(c.cpos) AS clen
  FROM tok t LEFT JOIN cand c ON c.doc_id = t.doc_id AND c.pos = t.pos
  GROUP BY 1
),
agg AS (
  SELECT doc_id,
         max(CASE WHEN n = 1 THEN clip END) AS p1n,
         max(CASE WHEN n = 1 THEN tot END) AS p1d,
         max(CASE WHEN n = 4 THEN clip END) AS p4n,
         max(CASE WHEN n = 4 THEN tot END) AS p4d,
         list_reduce(list_prepend(CAST(1 AS BIGINT),
                                  list(clip ORDER BY n)),
                     (a, x) -> a * x) AS pn,
         list_reduce(list_prepend(CAST(1 AS BIGINT),
                                  list(tot ORDER BY n)),
                     (a, x) -> a * x) AS pd
  FROM prec WHERE tot > 0
  GROUP BY doc_id HAVING count(*) = 4
)
SELECT a.doc_id, CAST(l.clen AS BIGINT) AS cand_len,
       CAST(l.rlen AS BIGINT) AS ref_len,
       CAST(p1n AS BIGINT) AS p1_num, CAST(p1d AS BIGINT) AS p1_den,
       CAST(p4n AS BIGINT) AS p4_num, CAST(p4d AS BIGINT) AS p4_den,
       CAST(CASE WHEN pd > 0 THEN 1000000 * pn // pd ELSE 0 END
            AS BIGINT) AS core_e6
FROM agg a JOIN lens l ON l.doc_id = a.doc_id
ORDER BY a.doc_id
"""


@register_extra("bleu_ngram_precisions", _BLEU_ORACLE)
def bleu_ngram_precisions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact BLEU components per document (see oracle comment). Plan:
    tokens explode once; the 4 n-gram orders build from ONE window
    pass of 3 leads (no per-n re-tokenization); clipped counts are a
    single (doc, n, gram) partial agg — the same shuffle shape the
    gated ngram/rouge rows use, linear in corpus size."""
    d = (
        _t(spark, sf_dir, "documents")
        .filter(F.octet_length("text") == F.length("text"))
        .select("doc_id", F.lower("text").alias("t"))
    )
    tok = (
        d.select(
            "doc_id",
            F.posexplode(F.split(F.trim("t"), r"\s+")).alias("i", "w"),
        )
        .filter(F.col("w") != "")
        .select("doc_id", (F.col("i") + 1).cast("long").alias("pos"), "w")
        .localCheckpoint(eager=False)
    )
    cand = tok.filter(
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("bd:"),
                        F.col("doc_id").cast("string"),
                        F.lit(":"),
                        F.col("pos").cast("string"),
                    ).cast("binary")
                ),
                1,
                4,
            ),
            16,
            10,
        ).cast("long")
        % 5
        != 0
    ).withColumn(
        "cpos",
        F.row_number().over(Window.partitionBy("doc_id").orderBy("pos")),
    )

    def _ngrams(src, ordcol):
        wo = Window.partitionBy("doc_id").orderBy(ordcol)
        g = src.select(
            "doc_id",
            F.col("w").alias("w1"),
            F.lead("w", 1).over(wo).alias("w2"),
            F.lead("w", 2).over(wo).alias("w3"),
            F.lead("w", 3).over(wo).alias("w4"),
        )
        return (
            g.select("doc_id", F.lit(1).alias("n"), F.col("w1").alias("gram"))
            .unionByName(
                g.filter(F.col("w2").isNotNull()).select(
                    "doc_id",
                    F.lit(2).alias("n"),
                    F.concat_ws(" ", "w1", "w2").alias("gram"),
                )
            )
            .unionByName(
                g.filter(F.col("w3").isNotNull()).select(
                    "doc_id",
                    F.lit(3).alias("n"),
                    F.concat_ws(" ", "w1", "w2", "w3").alias("gram"),
                )
            )
            .unionByName(
                g.filter(F.col("w4").isNotNull()).select(
                    "doc_id",
                    F.lit(4).alias("n"),
                    F.concat_ws(" ", "w1", "w2", "w3", "w4").alias("gram"),
                )
            )
        )

    ngc = _ngrams(cand, "cpos").withColumn("side", F.lit("c"))
    ngr = _ngrams(tok, "pos").withColumn("side", F.lit("r"))
    cnt = (
        ngc.unionByName(ngr)
        .groupBy("doc_id", "n", "gram")
        .agg(
            F.sum(F.when(F.col("side") == "c", 1).otherwise(0)).alias("cc"),
            F.sum(F.when(F.col("side") == "r", 1).otherwise(0)).alias("rc"),
        )
    )
    prec = (
        cnt.groupBy("doc_id", "n")
        .agg(
            F.sum(F.least("cc", "rc")).alias("clip"),
            F.sum("cc").alias("tot"),
        )
        .filter(F.col("tot") > 0)
    )
    D = "decimal(38,0)"
    agg = (
        prec.groupBy("doc_id")
        .agg(
            F.max(F.when(F.col("n") == 1, F.col("clip"))).alias("p1n"),
            F.max(F.when(F.col("n") == 1, F.col("tot"))).alias("p1d"),
            F.max(F.when(F.col("n") == 4, F.col("clip"))).alias("p4n"),
            F.max(F.when(F.col("n") == 4, F.col("tot"))).alias("p4d"),
            F.expr(
                "aggregate(array_sort(collect_list(struct(n, clip))),"
                " CAST(1 AS DECIMAL(38,0)),"
                " (a, x) -> CAST(a * x.clip AS DECIMAL(38,0)))"
            ).alias("pn"),
            F.expr(
                "aggregate(array_sort(collect_list(struct(n, tot))),"
                " CAST(1 AS DECIMAL(38,0)),"
                " (a, x) -> CAST(a * x.tot AS DECIMAL(38,0)))"
            ).alias("pd"),
            F.count(F.lit(1)).alias("nn"),
        )
        .filter(F.col("nn") == 4)
    )
    lens = (
        tok.join(
            cand.select("doc_id", "pos", F.lit(1).alias("kept")),
            ["doc_id", "pos"],
            "left",
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("rlen"),
            F.sum(F.coalesce("kept", F.lit(0))).alias("clen"),
        )
    )
    return (
        agg.join(lens, "doc_id")
        .select(
            "doc_id",
            F.col("clen").cast("long").alias("cand_len"),
            F.col("rlen").cast("long").alias("ref_len"),
            F.col("p1n").cast("long").alias("p1_num"),
            F.col("p1d").cast("long").alias("p1_den"),
            F.col("p4n").cast("long").alias("p4_num"),
            F.col("p4d").cast("long").alias("p4_den"),
            F.expr(
                "CAST(CASE WHEN pd > 0 THEN"
                " (CAST(1000000 AS DECIMAL(38,0)) * pn"
                "  - pmod(CAST(1000000 AS DECIMAL(38,0)) * pn, pd)) div pd"
                " ELSE 0 END AS BIGINT)"
            ).alias("core_e6"),
        )
        .orderBy("doc_id")
    )


# ------------------------------------------------ base64 audit

# Base64 (RFC 4648) as a cross-derivation: the Spark side calls the
# JVM's battle-tested base64() codec, while the oracle REBUILDS the
# encoding from scratch in SQL — 3-byte groups regrouped into four
# 6-bit indices against the literal alphabet, '=' padding from the
# tail length — so alphabet order, bit packing and padding rules are
# all hash-fatal (the same pattern as crc32_audit's zlib-vs-SQL).
# 24-char ASCII prefixes, md5 1-in-4 sample; n_pad covers all three
# tail classes.
_B64_ORACLE = """
WITH dd AS MATERIALIZED (
  SELECT doc_id,
         substr(text, 1,
                21 + CAST(('0x' || substr(md5('bl:'
                     || CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 3
                     AS INT)) AS t
  FROM documents
  WHERE strlen(text) = length(text) AND length(text) >= 24
    AND ('0x' || substr(md5('b6:' || CAST(doc_id AS VARCHAR)),
                        1, 4))::BIGINT % 4 = 0
),
alpha AS MATERIALIZED (
  SELECT 'ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/'
           AS a
),
blocks AS MATERIALIZED (
  SELECT doc_id, t, b.b,
         ascii(substr(t, 3 * b.b + 1, 1)) AS c1,
         CASE WHEN 3 * b.b + 2 <= length(t)
              THEN ascii(substr(t, 3 * b.b + 2, 1)) ELSE 0 END AS c2,
         CASE WHEN 3 * b.b + 3 <= length(t)
              THEN ascii(substr(t, 3 * b.b + 3, 1)) ELSE 0 END AS c3,
         length(t) - 3 * b.b AS rem
  FROM dd, (SELECT unnest(generate_series(0, 7)) AS b) b
  WHERE 3 * b.b < length(t)
),
enc AS MATERIALIZED (
  SELECT doc_id, b,
         substr(a, CAST((c1 >> 2) AS INT) + 1, 1)
         || substr(a, CAST(((c1 & 3) << 4) | (c2 >> 4) AS INT) + 1, 1)
         || CASE WHEN rem >= 2
                 THEN substr(a, CAST(((c2 & 15) << 2) | (c3 >> 6)
                                     AS INT) + 1, 1)
                 ELSE '=' END
         || CASE WHEN rem >= 3
                 THEN substr(a, CAST(c3 & 63 AS INT) + 1, 1)
                 ELSE '=' END AS quad
  FROM blocks CROSS JOIN alpha
)
SELECT d.doc_id, CAST(length(d.t) AS BIGINT) AS n_bytes,
       string_agg(e.quad, '' ORDER BY e.b) AS b64,
       CAST((3 - length(d.t) % 3) % 3 AS INT) AS n_pad
FROM dd d JOIN enc e ON e.doc_id = d.doc_id
GROUP BY d.doc_id, d.t
ORDER BY d.doc_id
"""


@register_extra("base64_audit", _B64_ORACLE)
def base64_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Base64 cross-derivation (see oracle comment): Spark's JVM
    base64() vs a from-scratch SQL bit-regrouping encoder. Map-only
    expression work at any scale."""
    d = (
        _t(spark, sf_dir, "documents")
        .filter(
            (F.octet_length("text") == F.length("text"))
            & (F.length("text") >= 24)
        )
        .filter(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("b6:"), F.col("doc_id").cast("string")
                        ).cast("binary")
                    ),
                    1,
                    4,
                ),
                16,
                10,
            ).cast("long")
            % 4
            == 0
        )
        .withColumn(
            "t",
            F.expr(
                "substr(text, 1, 21 + CAST("
                "CAST(conv(substring(md5(CAST(concat('bl:',"
                " CAST(doc_id AS STRING)) AS BINARY)), 1, 4), 16, 10)"
                " AS BIGINT) % 3 AS INT))"
            ),
        )
    )
    return d.select(
        "doc_id",
        F.length("t").cast("long").alias("n_bytes"),
        F.base64(F.col("t").cast("binary")).alias("b64"),
        ((3 - F.length("t") % 3) % 3).cast("int").alias("n_pad"),
    ).orderBy("doc_id")
