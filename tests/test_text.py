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
