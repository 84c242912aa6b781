"""bm25_topk + nb_classify: integer-exact retrieval and classification.

Each assertion replays the documented integer formulas by hand in
Python on a tiny corpus, so a formula drift in either the Spark code or
the docstring shows up as a concrete number, not just an oracle
mismatch.
"""

from __future__ import annotations


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string, lang string")


def _bits(x: int) -> int:
    return x.bit_length()


def _bm25_score(query_words, doc_tf, dl, corpus):
    """Reference implementation of the documented integer formula.

    corpus: list of (doc_words: list) for N/total/df computation.
    """
    n_docs = sum(1 for ws in corpus if ws)
    total = sum(len(ws) for ws in corpus)
    score = 0
    for w in set(query_words):
        df = sum(1 for ws in corpus if w in ws)
        if df == 0:
            continue
        idf_bits = _bits(n_docs // df) - 1
        if idf_bits <= 0 or w not in doc_tf:
            continue
        tf = doc_tf[w]
        sat = (22000 * tf * total) // (
            10 * total * tf + 3 * total + 9 * dl * n_docs
        )
        score += idf_bits * sat
    return score


def test_bm25_matches_hand_formula(spark):
    from xhtml_parser_spark.operators.retrieval import bm25_topk

    texts = [
        "apple banana apple cherry",
        "banana cherry date",
        "apple apple apple apple",
        "elephant fig grape",
        "apple elephant",
    ]
    docs = _docs(spark, [(i, t, "en") for i, t in enumerate(texts)])
    qdocs = _docs(spark, [(0, "apple elephant", "en")])
    got = {
        (r["query_id"], r["doc_id"]): (r["rank"], r["score"])
        for r in bm25_topk(docs, qdocs, k=5).collect()
    }
    corpus = [t.split() for t in texts]
    expected = {}
    for i, ws in enumerate(corpus):
        tf = {}
        for w in ws:
            tf[w] = tf.get(w, 0) + 1
        s = _bm25_score(["apple", "elephant"], tf, len(ws), corpus)
        if s > 0:
            expected[i] = s
    ranked = sorted(expected.items(), key=lambda kv: (-kv[1], kv[0]))
    assert got == {
        (0, d): (rank + 1, s) for rank, (d, s) in enumerate(ranked)
    }
    # "apple" appears in 3/5 docs -> idf_bits = bits(5//3)-1 = 0: it
    # must contribute nothing, so doc 2 (pure apple spam) only ranks
    # via... nothing -> absent; doc 4 leads on the rare "elephant".
    assert (0, 2) not in got
    assert min(got, key=lambda k: got[k][0])[1] in (3, 4)


def test_bm25_bounded_query_batch_and_ties(spark):
    from xhtml_parser_spark.operators.retrieval import bm25_topk

    # two docs with IDENTICAL text tie on score -> rank breaks on doc_id
    docs = _docs(
        spark,
        [
            (1, "zebra yak", "en"),
            (2, "zebra yak", "en"),
            (3, "ant bee cat", "en"),
            (4, "dog emu fox", "en"),  # N=4 so zebra's idf_bits = bits(4//2)-1 = 1
        ],
    )
    q = _docs(spark, [(9, "zebra", "en")])
    rows = sorted(
        (r["rank"], r["doc_id"]) for r in bm25_topk(docs, q, k=5).collect()
    )
    assert [d for _, d in rows] == [1, 2]
    assert [r for r, _ in rows] == [1, 2]


def test_nb_classify_separable_corpus(spark):
    from xhtml_parser_spark.operators.retrieval import nb_classify

    # class-pure vocabularies; doc_id % 3 == 0 rows are the test split
    rows = []
    for i in range(12):
        if i % 2 == 0:
            rows.append((i, "bonjour le monde le", "fr"))
        else:
            rows.append((i, "hello the world the", "en"))
    got = {
        (r["actual"], r["predicted"]): r["n"]
        for r in nb_classify(_docs(spark, rows), label_col="lang").collect()
    }
    # test split = ids 0,3,6,9 -> 2 fr + 2 en, all correctly classified
    assert got == {("fr", "fr"): 2, ("en", "en"): 2}


def test_nb_classify_oov_and_tie_break(spark):
    from xhtml_parser_spark.operators.retrieval import nb_classify

    # the test doc (id 0) is ENTIRELY out-of-vocabulary: every class
    # scores the same smoothing bits per token, so the argmin tie must
    # break to the lexicographically first class.
    rows = [
        (0, "qqq zzz", "en"),
        (1, "hello world", "en"),
        (2, "bonjour monde", "fr"),
        (4, "hello there", "en"),
        (5, "bonjour amis", "fr"),
    ]
    got = {
        (r["actual"], r["predicted"]): r["n"]
        for r in nb_classify(_docs(spark, rows), label_col="lang").collect()
    }
    # tot_en = 4, tot_fr = 4, V = 7 -> equal bits -> predicted "en"
    assert got == {("en", "en"): 1}


def test_nb_classify_empty_text_rows_drop(spark):
    from xhtml_parser_spark.operators.retrieval import nb_classify

    rows = [
        (0, "", "en"),  # test-split row with no tokens: no prediction
        (3, "hola amigos", "es"),
        (1, "hola mundo", "es"),
        (2, "hola tierra", "es"),
    ]
    got = {
        (r["actual"], r["predicted"]): r["n"]
        for r in nb_classify(_docs(spark, rows), label_col="lang").collect()
    }
    assert got == {("es", "es"): 1}
