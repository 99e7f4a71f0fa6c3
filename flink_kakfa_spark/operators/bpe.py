"""Iterative BPE tokenizer training (Sennrich et al., 2016).

``text.py::text_bpe_merge_pairs`` computes ONE round of merge-pair
statistics; this module runs the actual training loop: k rounds of
(count adjacent symbol pairs weighted by word frequency) -> (pick the
most frequent pair, ties to the lexicographically smallest) -> (merge
that pair left-to-right in every vocabulary word). The learned merge
table IS the tokenizer.

Spark-first shape: training operates on the *word-frequency
vocabulary* (one row per distinct word — sublinear in corpus size),
exactly as reference BPE trainers do, never on the token stream. Each
round is one hash aggregate over the vocab plus a narrow in-array
merge fold; the chosen pair is a driver-side ``first()`` per round
(k small, like ``dedup_clusters``'s per-round convergence count).
Lineage is kept bounded by caching each round's vocab and unpersisting
the previous one.

Oracle (round 7, VERDICT r6 item 3): the k merge rounds UNROLL as a
DuckDB CTE chain, so both queries are value-exact. The key trick is a
string encoding of the symbol array — symbols joined by a DOUBLE
``\\x1f`` separator with double separators at both ends — under which
one BPE merge of pair (l, r) is exactly one SQL ``replace``:

    replace(s, SEP||l||SEP||SEP||r||SEP, SEP||l||r||SEP)

Each match consumes the inner halves of the two flanking boundary
markers, so adjacent occurrences never share a matched character and
``replace``'s left-to-right non-overlapping scan reproduces the BPE
fold's semantics ("after merging at i, position i+1 cannot start a
merge") — verified against a pure-Python fold on adversarial
overlap cases in tests/test_bpe.py. The pure-Python reference trainer
remains pinned on micro corpora AND the sf0.001 fixture.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_kakfa_spark.registry import query
from flink_kakfa_spark.sources.tables import load_table

N_MERGES = 8
EOW = "</w>"  # end-of-word marker, merged like any symbol

# Oracle-side symbol-array encoding: symbols joined (and flanked) by a
# DOUBLE unit separator. \x1f cannot occur in the corpus (fixtures are
# printable text) and not in EOW, so boundaries are unambiguous.
_SEP = "\x1f"
_SEP2 = _SEP + _SEP


def _bpe_oracle_ctes(n_merges: int) -> str:
    """The shared CTE chain both BPE oracles build on: word-frequency
    vocabulary -> n unrolled merge rounds. Defines ``v{i}`` (vocab
    after i merges, symbol arrays encoded as strings) and ``b{i}``
    (round i's chosen merge: step/"left"/"right"/pair_freq; empty once
    the best pair's frequency drops below 2, which empties every later
    round — the SQL mirror of the trainer's break)."""
    parts = [
        f"""
    words AS (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS freq
      FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      WHERE word <> ''
      GROUP BY word
    ),
    v0 AS (
      SELECT word, freq,
             '{_SEP2}' || array_to_string(
               list_append(string_split(word, ''), '{EOW}'), '{_SEP2}'
             ) || '{_SEP2}' AS s
      FROM words
    )"""
    ]
    for i in range(n_merges):
        parts.append(
            f"""
    a{i} AS (
      SELECT freq, string_split(trim(s, '{_SEP}'), '{_SEP2}') AS arr FROM v{i}
    ),
    p{i} AS (
      SELECT arr[g.i] AS "left", arr[g.i + 1] AS "right",
             CAST(SUM(freq) AS BIGINT) AS pair_freq
      FROM a{i}, UNNEST(generate_series(1, len(arr) - 1)) AS g(i)
      GROUP BY 1, 2
    ),
    b{i} AS (
      SELECT * FROM (
        SELECT {i} AS step, "left", "right", pair_freq FROM p{i}
        ORDER BY pair_freq DESC, "left" ASC, "right" ASC LIMIT 1
      ) WHERE pair_freq >= 2
    ),
    v{i + 1} AS (
      -- LEFT JOIN ON TRUE, not an inner cross join: once a round's
      -- best pair drops below freq 2, b{{i}} is empty and an inner
      -- join would empty every later vocab CTE — the trainer instead
      -- BREAKS and tokenizes with the merges learned so far. With the
      -- left join, b.* is NULL, replace() is NULL, and COALESCE
      -- carries the previous round's vocab through unchanged.
      SELECT w.word, w.freq,
             COALESCE(
               replace(w.s,
                       '{_SEP}' || b."left" || '{_SEP2}' || b."right" || '{_SEP}',
                       '{_SEP}' || b."left" || b."right" || '{_SEP}'),
               w.s) AS s
      FROM v{i} w LEFT JOIN b{i} b ON TRUE
    )"""
        )
    return "WITH" + ",".join(parts)


_TRAIN_ORACLE = (
    _bpe_oracle_ctes(N_MERGES)
    + "".join(
        f"""
    SELECT CAST(step AS INTEGER) AS step, "left", "right", pair_freq FROM b{i}
    {'UNION ALL' if i < N_MERGES - 1 else ''}"""
        for i in range(N_MERGES)
    )
    + "\n    ORDER BY step"
)

_TOKENIZE_ORACLE = (
    _bpe_oracle_ctes(N_MERGES)
    + f"""
    SELECT token, CAST(SUM(freq) AS BIGINT) AS n_occurrences
    FROM (
      SELECT unnest(string_split(trim(s, '{_SEP}'), '{_SEP2}')) AS token, freq
      FROM v{N_MERGES}
    )
    GROUP BY token
    ORDER BY n_occurrences DESC, token ASC
    LIMIT 20
    """
)


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _merge_expr(left: str, right: str) -> str:
    """Left-to-right non-overlapping merge of (left, right) in ``syms``.

    A fold with one pending symbol of lookahead: classic BPE merge
    semantics (after merging at i, position i+1 cannot start a merge).
    """
    l, r, m = _sql_quote(left), _sql_quote(right), _sql_quote(left + right)
    return f"""
    aggregate(
      syms,
      named_struct('acc', cast(array() as array<string>),
                   'pend', cast(null as string)),
      (st, x) -> CASE
          WHEN st.pend IS NULL
            THEN named_struct('acc', st.acc, 'pend', x)
          WHEN st.pend = {l} AND x = {r}
            THEN named_struct('acc', array_append(st.acc, {m}),
                              'pend', cast(null as string))
          ELSE named_struct('acc', array_append(st.acc, st.pend), 'pend', x)
        END,
      st -> CASE WHEN st.pend IS NULL THEN st.acc
                 ELSE array_append(st.acc, st.pend) END)
    """


def train_bpe(
    spark: SparkSession, words: DataFrame, n_merges: int = N_MERGES
) -> DataFrame:
    """Run the BPE training loop over a (word, freq) vocabulary frame.

    Returns the merge table (step, left, right, pair_freq) — the
    driver-resident artifact every BPE trainer produces.
    """
    vocab = words.select(
        F.expr(f"concat(split(word, ''), array('{EOW}'))").alias("syms"),
        F.col("freq"),
    ).cache()
    merges = []
    for step in range(n_merges):
        # size guard: Spark's sequence(0, -1) yields a DESCENDING
        # [0, -1] (not empty), which would fabricate (sym, NULL) pairs
        # for fully-merged single-symbol words
        pairs = (
            vocab.filter(F.size("syms") >= 2)
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(0, size(syms) - 2),"
                        " i -> struct(syms[i] AS left, syms[i + 1] AS right))"
                    )
                ).alias("p"),
                "freq",
            )
            .groupBy("p.left", "p.right")
            .agg(F.sum("freq").alias("pair_freq"))
        )
        best = pairs.orderBy(
            F.col("pair_freq").desc(), F.col("left").asc(), F.col("right").asc()
        ).first()
        if best is None or best["pair_freq"] < 2:
            break  # nothing left worth merging
        merges.append(
            (step, best["left"], best["right"], int(best["pair_freq"]))
        )
        nxt = vocab.select(
            F.expr(_merge_expr(best["left"], best["right"])).alias("syms"),
            "freq",
        ).cache()
        nxt.count()  # materialize before dropping the parent
        vocab.unpersist()
        vocab = nxt
    vocab.unpersist()
    return spark.createDataFrame(
        merges, "step int, left string, right string, pair_freq long"
    )


@query("text_bpe_train_merges", oracle=_TRAIN_ORACLE)
def q_text_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train 8 BPE merges on the documents corpus.

    Word frequencies come from one corpus pass; every training round
    then touches only the vocabulary (distinct words), the same
    train-on-vocab shortcut reference BPE implementations use. Ties
    break (freq desc, left asc, right asc), so the merge table is
    fully deterministic — pinned against an independent pure-Python
    trainer in tests, including on this very fixture.
    """
    d = load_table(spark, "documents", sf_dir)
    words = (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    return train_bpe(spark, words, N_MERGES)


def apply_merges(words: DataFrame, merges: list[tuple[str, str]]) -> DataFrame:
    """Segment each word with a learned merge list (Sennrich apply:
    each merge replaces ALL its occurrences, in rank order, one pass
    through the list). Adds a ``tokens`` array column.

    Each fold references ``syms`` exactly once (column-level, not
    per-element), so chaining k merges costs k passes — the HOF
    inlining trap (SCALE.md) does not bite here.
    """
    out = words.withColumn(
        "syms", F.expr(f"concat(split(word, ''), array('{EOW}'))")
    )
    for left, right in merges:
        out = out.withColumn("syms", F.expr(_merge_expr(left, right)))
    return out.withColumnRenamed("syms", "tokens")


@query("text_bpe_tokenize", oracle=_TOKENIZE_ORACLE)
def q_text_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize the corpus with the merges ``text_bpe_train_merges``
    learns, and report the resulting token vocabulary's top 20 by
    corpus occurrence count.

    Train-then-apply end to end: tokenization runs on the distinct-word
    vocabulary and re-weights by word frequency (the same
    vocab-not-stream shortcut as training), so the corpus text is
    scanned once no matter how many merges apply.
    """
    d = load_table(spark, "documents", sf_dir)
    words = (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    merges = [
        (r["left"], r["right"])
        for r in train_bpe(spark, words, N_MERGES).collect()
    ]
    return (
        apply_merges(words, merges)
        .select(F.explode("tokens").alias("token"), "freq")
        .groupBy("token")
        .agg(F.sum("freq").alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.asc("token"))
        .limit(20)
    )
