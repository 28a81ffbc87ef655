"""Text analysis: language ID, quality scoring, tokenization,
fingerprinting."""

from pyspark.sql import functions as F

from biosets_spark.operators import text as TX


def test_lang_id_on_crafted_samples(spark):
    rows = [
        (1, "the cat sat on the mat and it was happy that the sun is out"),
        (2, "el perro y el gato que viven en la casa de los abuelos"),
        (3, "le chat et le chien sont les amis de la famille est une chose"),
        (4, "der hund und die katze sind ein teil von der familie mit uns"),
        (5, "xyzzy plugh qwerty"),  # no stopwords -> und
    ]
    df = spark.createDataFrame(rows, "id int, text string")
    got = {r.id: r.lang_pred for r in TX.lang_id(df).collect()}
    assert got == {1: "en", 2: "es", 3: "fr", 4: "de", 5: "und"}


def test_quality_features_and_score(spark):
    rows = [
        (1, "a perfectly normal sentence with enough tokens to pass the gate"),
        (2, "x"),  # too short
        (3, "1234 5678 9999 0000 1111 2222"),  # digit-dominated
        (4, "!!! ??? ... ;;; ::: ,,, !!!"),  # punct-dominated
    ]
    df = spark.createDataFrame(rows, "id int, text string")
    out = {r.id: r for r in TX.quality_score(df).collect()}
    assert out[1].keep and out[1].quality_score >= 0.85
    assert not out[2].keep
    assert not out[3].keep
    assert not out[4].keep
    assert out[1].n_tokens == 11
    assert out[3].digit_ratio > 0.5


def test_token_count_edges(spark):
    df = spark.createDataFrame([(1, "  a  b   c  "), (2, ""), (3, "one")], "id int, text string")
    got = {r.id: r.n for r in df.select("id", TX.token_count(F.col("text")).alias("n")).collect()}
    assert got == {1: 3, 2: 0, 3: 1}


def test_bpe_tokens(spark):
    df = spark.createDataFrame([(1, "hello, world! x2")], "id int, text string")
    toks = df.select(TX.bpe_tokens(F.col("text")).alias("t")).first().t
    assert toks == ["hello", ",", "world", "!", "x", "2"]


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world"), (3, "other")], "id int, text string"
    )
    fps = {r.id: r.fingerprint for r in TX.doc_fingerprint(df).collect()}
    assert fps[1] == fps[2] != fps[3]


def test_rolling_hash_order_sensitive(spark):
    df = spark.createDataFrame([(1, "a b c"), (2, "c b a"), (3, "a b c")], "id int, text string")
    h = {r.id: r.rhash for r in TX.rolling_hash(df).collect()}
    assert h[1] == h[3] != h[2]


def test_tf_idf(spark):
    rows = [(1, "apple banana apple"), (2, "banana cherry"), (3, "apple")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r.doc_id, r.term): r for r in TX.tf_idf(df).collect()}
    assert out[(1, "apple")].tf == 2
    # 'apple' appears in 2 of 3 docs; 'cherry' in 1 -> cherry idf higher
    assert out[(2, "cherry")].idf > out[(1, "apple")].idf
    assert out[(1, "apple")].tf_idf == out[(1, "apple")].tf * out[(1, "apple")].idf


def test_term_doc_freq(spark):
    rows = [(1, "a b a"), (2, "a c")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.term: (r.doc_freq, r.term_freq) for r in TX.term_doc_freq(df).collect()}
    assert got == {"a": (2, 3), "b": (1, 1), "c": (1, 1)}


def test_repetition_stats(spark):
    rows = [
        (1, "spam ham spam ham spam ham"),   # 'spam ham' bigram dominates
        (2, "all words here are different"),
        (3, "one"),                          # no bigrams -> omitted
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in TX.repetition_stats(df).collect()}
    assert set(got) == {1, 2}
    # doc 1: bigrams = [spam ham, ham spam, spam ham, ham spam, spam ham]
    assert abs(got[1].top_bigram_frac - 3 / 5) < 1e-12
    assert abs(got[1].distinct_token_ratio - 2 / 6) < 1e-12
    assert abs(got[2].top_bigram_frac - 1 / 4) < 1e-12
    assert got[2].distinct_token_ratio == 1.0


def test_char_entropy(spark):
    import math

    rows = [(1, "aaaa"), (2, "abab"), (3, "abcd")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.entropy for r in TX.char_entropy(df).collect()}
    assert got[1] == 0.0
    assert abs(got[2] - math.log(2)) < 1e-12
    assert abs(got[3] - math.log(4)) < 1e-12
    # carry_cols rides attributes through without a join
    df2 = spark.createDataFrame([(1, "x", "aa")], "doc_id long, lang string, text string")
    r = TX.char_entropy(df2, carry_cols=["lang"]).first()
    assert r.lang == "x" and r.entropy == 0.0


def test_gopher_rules(spark):
    long_ok = " ".join(f"word{i}" for i in range(40))
    short = "too short"
    repetitive = " ".join(["dup"] * 40)
    numeric = " ".join(["123"] * 35 + ["a b c d e".split()[0]] * 5)
    df = spark.createDataFrame(
        [(1, long_ok), (2, short), (3, repetitive), (4, numeric)],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in TX.gopher_rules(df).collect()}
    assert got[1].gopher_keep
    assert not got[2].rule_word_count          # 2 words < 30
    assert not got[3].rule_distinct            # 1/40 distinct
    assert not got[4].rule_alpha               # mostly digit words
    assert got[1].n_words == 40


def test_bm25_scores(spark):
    rows = [
        (1, "apple apple apple"),        # high tf for apple
        (2, "apple pie recipe book"),
        (3, "unrelated words entirely"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.bm25 for r in TX.bm25_scores(df, ["apple"]).collect()}
    assert set(got) == {1, 2}              # doc 3 matches nothing
    assert got[1] > got[2] > 0             # tf saturation still ranks 3x above 1x


def test_redact_pii(spark):
    from biosets_spark.operators import pii as PII

    rows = [
        (1, "mail me at bob@example.com or call +1 555-123-4567"),
        (2, "server at 10.0.0.7 and backup 192.168.1.1"),
        (3, "user@10.0.0.7 mixed form"),
        (4, "nothing sensitive here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in PII.redact_pii(df).collect()}
    assert got[1].n_email == 1 and got[1].n_phone == 1
    assert "<EMAIL>" in got[1].text and "<PHONE>" in got[1].text
    assert got[2].n_ip == 2 and got[2].text.count("<IP>") == 2
    # digit-host "addresses" are not emails (the RE requires an
    # alphabetic TLD) — the embedded IP is caught by the IP pass
    assert got[3].n_email == 0 and got[3].n_ip == 1
    assert got[3].text == "user@<IP> mixed form"
    assert got[4].n_email == got[4].n_ip == got[4].n_phone == 0
    assert got[4].text == rows[3][1]
    assert got[4].pii_chars_removed == 0


def test_repetition_stats_methods_agree(spark):
    rows = [
        (1, "spam ham spam ham spam ham"),
        (2, "all words here are different"),
        (4, "x y x y x z z z z y"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = {r.doc_id: (r.top_bigram_frac, r.distinct_token_ratio)
         for r in TX.repetition_stats(df, method="expr").collect()}
    b = {r.doc_id: (r.top_bigram_frac, r.distinct_token_ratio)
         for r in TX.repetition_stats(df, method="explode").collect()}
    assert a == b


def test_token_cooccurrence_pmi(spark):
    import math

    rows = [
        (1, "alpha beta gamma"),
        (2, "alpha beta"),
        (3, "alpha beta beta beta"),  # repeats count once per doc
        (4, "gamma delta"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.t1, r.t2): (r.pair_count, r.pmi)
           for r in TX.token_cooccurrence(df, min_pair_count=1).collect()}
    # (alpha, beta) co-occur in docs 1,2,3; df(alpha)=3, df(beta)=3, N=4
    pc, pmi = got[("alpha", "beta")]
    assert pc == 3
    assert abs(pmi - math.log(3 * 4 / (3 * 3))) < 1e-12
    # per-doc distinct: repeated "beta" in doc 3 contributes one posting
    assert got[("beta", "gamma")][0] == 1
    # ordering contract: t1 < t2, each unordered pair once
    assert all(t1 < t2 for t1, t2 in got)
    assert ("beta", "alpha") not in got
    # min_df prunes the vocab before the self-join
    pruned = {(r.t1, r.t2) for r in
              TX.token_cooccurrence(df, min_pair_count=1, min_df=3).collect()}
    assert pruned == {("alpha", "beta")}


def test_unigram_surprise(spark):
    import math

    df = spark.createDataFrame(
        [
            (1, "a a a a"),          # all common tokens
            (2, "a a rare1 rare2"),  # half rare tokens
            (3, ""),                 # empty doc: no output row
        ],
        "doc_id int, text string",
    )
    rows = {r["doc_id"]: r for r in TX.unigram_surprise(df).collect()}
    # corpus: a x6, rare1 x1, rare2 x1 -> N=8
    assert set(rows) == {1, 2}
    assert rows[1]["n_tokens"] == 4
    exp1 = -math.log(6 / 8)
    assert abs(rows[1]["xent"] - exp1) < 1e-6
    # doc 2 mixes common and rare -> strictly higher cross-entropy
    assert rows[2]["xent"] > rows[1]["xent"]
    exp2 = (2 * -math.log(6 / 8) + 2 * -math.log(1 / 8)) / 4
    assert abs(rows[2]["xent"] - exp2) < 1e-6


def test_ascii_ratio(spark):
    df = spark.createDataFrame(
        [
            (1, "abc", 3),      # pure printable ASCII
            (2, "abé", 3),  # one non-ASCII char
            (3, "", 0),         # empty: defined as 1.0
        ],
        "doc_id int, text string, n_chars int",
    )
    out = {
        r["doc_id"]: r["r"]
        for r in df.select(
            "doc_id", TX.ascii_ratio(F.col("text"), F.col("n_chars")).alias("r")
        ).collect()
    }
    assert out[1] == 1.0
    assert abs(out[2] - 2 / 3) < 1e-9
    assert out[3] == 1.0


def test_spans_and_span_dedup(spark):
    """spans(): non-overlapping 10-token windows, partial tail kept;
    span_dedup_stats: cross-doc span frequency -> per-doc dup ratio."""
    twelve = " ".join(f"w{i}" for i in range(12))
    df = spark.createDataFrame(
        [
            (1, twelve),                # spans: w0..w9, w10 w11
            (2, twelve + " extra"),     # shares span 1 (w0..w9); tail differs
            (3, "totally different words here"),
        ],
        "doc_id long, text string",
    )
    sp = df.select(TX.spans(F.col("text"), 10).alias("s")).collect()
    assert [len(r["s"]) for r in sp] == [2, 2, 1]
    assert sp[0]["s"][0] == " ".join(f"w{i}" for i in range(10))
    assert sp[0]["s"][1] == "w10 w11"

    out = {r["doc_id"]: r for r in TX.span_dedup_stats(df, span_tokens=10).collect()}
    assert out[1]["n_spans"] == 2 and out[1]["dup_spans"] == 1
    assert abs(out[1]["dup_frac"] - 0.5) < 1e-12
    assert out[2]["dup_spans"] == 1
    assert out[3]["dup_spans"] == 0 and out[3]["dup_frac"] == 0.0


def test_containment_pairs(spark):
    """A small doc fully contained in a big doc scores containment 1.0
    in the small->big direction but low Jaccard symmetrically."""
    from biosets_spark.operators import dedup as D

    small = " ".join(f"t{i}" for i in range(8))
    big = small + " " + " ".join(f"pad{i}" for i in range(40))
    df = spark.createDataFrame(
        [(1, small), (2, big), (3, "unrelated content entirely here now")],
        "doc_id long, text string",
    )
    pairs = {
        (r["id_small"], r["id_big"]): r["containment"]
        for r in D.containment_pairs(df, n=4, threshold=0.8).collect()
    }
    assert pairs[(1, 2)] == 1.0          # small's shingles all inside big
    assert (2, 1) not in pairs           # big is NOT contained in small
    # symmetric Jaccard would miss this pair at the same bar
    jac = {(r["id_a"], r["id_b"]) for r in
           D.ngram_jaccard_pairs(df, n=4, threshold=0.8).collect()}
    assert (1, 2) not in jac


def test_tfidf_keywords(spark):
    """Corpus-common terms rank below doc-distinctive terms; rank cut
    is total via the term tie-break."""
    df = spark.createDataFrame(
        [
            (1, "common common apple apple apple"),
            (2, "common banana"),
            (3, "common cherry cherry"),
        ],
        "doc_id long, text string",
    )
    kw = TX.tfidf_keywords(df, k=2)
    rows = {(r["doc_id"], r["rank"]): r["term"] for r in kw.collect()}
    assert rows[(1, 1)] == "apple"       # tf=3, df=1 -> top score
    assert rows[(2, 1)] == "banana"
    assert rows[(3, 1)] == "cherry"
    # 'common' appears in every doc -> idf = ln(3/3) = 0 -> never rank 1
    assert all(t != "common" for (d, r), t in rows.items() if r == 1)


def test_bigram_surprise(spark):
    """A doc whose tokens are common but whose bigrams never occur
    elsewhere scores higher than a doc repeating the corpus's dominant
    bigram; docs with < 2 tokens produce no row."""
    df = spark.createDataFrame(
        [
            (1, "the cat sat"),
            (2, "the cat sat"),
            (3, "the cat sat"),
            (4, "sat the cat"),   # same unigrams, unseen-elsewhere bigrams
            (5, "solo"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in TX.bigram_surprise(df).collect()}
    assert 5 not in out                       # < 2 tokens -> no bigrams
    assert out[1]["n_bigrams"] == 2
    assert out[4]["xent"] > out[1]["xent"]    # mis-strung doc is more surprising
    # docs 1-3 are identical -> identical quantized sums
    assert out[1]["sum_surprise"] == out[2]["sum_surprise"] == out[3]["sum_surprise"]
