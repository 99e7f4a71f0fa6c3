"""BPE trainer verified against an independent pure-Python reference
implementation — on micro corpora with known merges AND on the
sf0.001 fixture. Since round 7 both BPE queries also carry value-exact
unrolled-CTE DuckDB oracles (diffcheck + driver); these tests remain
the third, engine-independent witness.
"""

from __future__ import annotations

from collections import Counter

import duckdb
from pyspark.sql import Row

from flink_kakfa_spark.operators.bpe import EOW, train_bpe
from flink_kakfa_spark.registry import all_queries


def _py_bpe(word_freqs: dict[str, int], n_merges: int):
    """Reference BPE: same tie-break (freq desc, left asc, right asc),
    same left-to-right non-overlapping merge, same stop rule."""
    vocab = [(list(w) + [EOW], f) for w, f in word_freqs.items()]
    merges = []
    for step in range(n_merges):
        pairs: Counter = Counter()
        for syms, f in vocab:
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        (left, right), freq = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if freq < 2:
            break
        merges.append((step, left, right, freq))
        new_vocab = []
        for syms, f in vocab:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab.append((out, f))
        vocab = new_vocab
    return merges


def test_bpe_known_corpus(spark):
    # the Sennrich paper's canonical example family
    freqs = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    words = spark.createDataFrame(
        [Row(word=w, freq=f) for w, f in freqs.items()]
    )
    got = [
        (r["step"], r["left"], r["right"], r["pair_freq"])
        for r in train_bpe(spark, words, 6).collect()
    ]
    assert got == _py_bpe(freqs, 6)
    # first merge on this corpus is the famous ('e','s') with freq 9
    assert got[0][1:] == ("e", "s", 9)


def test_bpe_merge_is_left_to_right_nonoverlapping(spark):
    # 'aaaa' with pair (a,a): left-to-right gives [aa, aa], not 3 merges
    words = spark.createDataFrame([Row(word="aaaa", freq=4)])
    got = [
        (r["step"], r["left"], r["right"], r["pair_freq"])
        for r in train_bpe(spark, words, 2).collect()
    ]
    assert got == _py_bpe({"aaaa": 4}, 2)
    assert got[0][:3] == (0, "a", "a")
    # after merging a+a -> aa, the word is [aa, aa, </w>]: pairs
    # (aa, aa) and (aa, </w>) both have freq 4, and '</w>' sorts
    # before 'aa', so the tie-break picks (aa, </w>)
    assert got[1][1:] == ("aa", "</w>", 4)


def test_bpe_matches_python_on_fixture(spark, sf_dir):
    rows = duckdb.sql(
        f"""SELECT u.w AS word, COUNT(*) AS f
            FROM read_parquet('{sf_dir}/documents.parquet'),
                 UNNEST(string_split(text, ' ')) AS u(w)
            WHERE u.w <> '' GROUP BY u.w"""
    ).fetchall()
    expected = _py_bpe(dict(rows), 8)
    got = [
        (r["step"], r["left"], r["right"], r["pair_freq"])
        for r in all_queries()["text_bpe_train_merges"](spark, sf_dir).collect()
    ]
    assert got == expected
    assert len(got) == 8


def _py_apply(word: str, merges) -> list[str]:
    syms = list(word) + [EOW]
    for left, right in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                out.append(left + right)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def test_oracle_replace_encoding_matches_fold():
    """The DuckDB oracle's one-replace-per-merge trick (double-SEP
    symbol encoding) must reproduce the left-to-right non-overlapping
    fold on adversarial overlap shapes — runs/odd runs/adjacent
    occurrences/false-boundary suffixes — no Spark needed."""
    from flink_kakfa_spark.operators.bpe import _SEP, _SEP2

    con = duckdb.connect()
    cases = [
        (["a", "a", "a", "a"], ("a", "a")),   # adjacent occurrences share a boundary
        (["a", "a", "a"], ("a", "a")),        # odd run: last 'a' survives
        (["b", "a", "a", "a", "c"], ("a", "a")),
        (["xl", "r"], ("l", "r")),            # 'l' mid-symbol: must NOT merge
        (["l", "rx", "r"], ("l", "r")),       # 'r' prefix of next symbol: no merge
        (["l", "r", "l", "r"], ("l", "r")),
        (["lr", "l", "r"], ("l", "r")),       # merged symbol equals pair concat
        (["a"], ("a", "a")),                  # single symbol: untouched
    ]
    for syms, (left, right) in cases:
        s = _SEP2 + _SEP2.join(syms) + _SEP2
        got_s = con.execute(
            "SELECT replace(?, ?, ?)",
            [s, _SEP + left + _SEP2 + right + _SEP, _SEP + left + right + _SEP],
        ).fetchone()[0]
        got = got_s.strip(_SEP).split(_SEP2)
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                out.append(left + right)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        assert got == out, (syms, left, right, got, out)


def _micro_documents(tmp_path, texts: list[str]) -> str:
    """Write a minimal documents.parquet so registered queries (which
    load by sf_dir) can run on a hand-built corpus."""
    tmp_path.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    for i, t in enumerate(texts):
        con.execute("INSERT INTO documents VALUES (?, ?)", [i, t])
    out = str(tmp_path / "documents.parquet")
    con.execute(f"COPY documents TO '{out}' (FORMAT PARQUET)")
    return str(tmp_path)


def test_bpe_early_stop_oracle_matches_engine(spark, tmp_path):
    """Corpus that exhausts merges before N_MERGES rounds: the trainer
    breaks and tokenizes with the merges learned so far, and the
    unrolled-CTE oracle must do the same (v{i+1} falls back to v{i}
    when round i learns nothing) instead of going empty — the latent
    divergence ADVICE r7 flagged. Pins train AND tokenize, Spark vs
    DuckDB oracle vs pure-Python, on two shapes: 2 learnable merges,
    and 0 learnable merges."""
    from flink_kakfa_spark.operators.bpe import _TOKENIZE_ORACLE, _TRAIN_ORACLE

    for texts, freqs in [
        (["ab ab"], {"ab": 2}),             # 2 merges then single-symbol words
        (["q w e r t y"], None),             # all pairs freq 1: 0 merges
    ]:
        sf = _micro_documents(tmp_path / f"c{len(texts[0])}", texts)
        if freqs is None:
            freqs = Counter(texts[0].split())
        expected_merges = _py_bpe(dict(freqs), 8)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS"
            f" SELECT * FROM read_parquet('{sf}/documents.parquet')"
        )
        oracle_merges = [tuple(r) for r in con.execute(_TRAIN_ORACLE).fetchall()]
        assert oracle_merges == expected_merges
        spark_merges = [
            (r["step"], r["left"], r["right"], r["pair_freq"])
            for r in all_queries()["text_bpe_train_merges"](spark, sf).collect()
        ]
        assert spark_merges == expected_merges
        assert len(expected_merges) < 8  # the early stop actually fired

        counts: Counter = Counter()
        merge_pairs = [(l, r) for _, l, r, _ in expected_merges]
        for w, f in freqs.items():
            for tok in _py_apply(w, merge_pairs):
                counts[tok] += f
        expected_tokens = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
        oracle_tokens = [tuple(r) for r in con.execute(_TOKENIZE_ORACLE).fetchall()]
        assert oracle_tokens == expected_tokens  # pre-fix: 0 rows here
        spark_tokens = [
            (r["token"], r["n_occurrences"])
            for r in all_queries()["text_bpe_tokenize"](spark, sf).collect()
        ]
        assert spark_tokens == expected_tokens


def test_bpe_tokenize_matches_python_on_fixture(spark, sf_dir):
    rows = duckdb.sql(
        f"""SELECT u.w AS word, COUNT(*) AS f
            FROM read_parquet('{sf_dir}/documents.parquet'),
                 UNNEST(string_split(text, ' ')) AS u(w)
            WHERE u.w <> '' GROUP BY u.w"""
    ).fetchall()
    freqs = dict(rows)
    merges = [(l, r) for _, l, r, _ in _py_bpe(freqs, 8)]
    counts: Counter = Counter()
    for w, f in freqs.items():
        for tok in _py_apply(w, merges):
            counts[tok] += f
    expected = sorted(
        counts.items(), key=lambda kv: (-kv[1], kv[0])
    )[:20]
    got = [
        (r["token"], r["n_occurrences"])
        for r in all_queries()["text_bpe_tokenize"](spark, sf_dir).collect()
    ]
    assert got == expected
