"""Unit tests for the scalar expression libraries (SURVEY.md §2.8)."""

from __future__ import annotations

import difflib
import math
import unicodedata

from pyspark.sql import functions as F

from hebrew_tutor_data_pipeline_spark.functions import hebrew as H
from hebrew_tutor_data_pipeline_spark.functions import similarity as S
from hebrew_tutor_data_pipeline_spark.functions import text as T

# Gen 1:1 with nikkud — the reference's canonical golden sample
# (`scripts/hebrew_encoding_test.py`).
GEN_1_1 = "בְּרֵאשִׁית בָּרָא אֱלֹהִים אֵת הַשָּׁמַיִם וְאֵת הָאָרֶץ"
GEN_1_1_BARE = "בראשית ברא אלהים את השמים ואת הארץ"


def one(spark, expr, **cols):
    """Evaluate a Column over a single-row DataFrame built from cols."""
    df = spark.createDataFrame([tuple(cols.values())], list(cols.keys()))
    return df.select(expr.alias("v")).first()["v"]


class TestHebrew:
    def test_strip_nikkud_roundtrip(self, spark):
        got = one(spark, H.strip_nikkud(F.col("s")), s=GEN_1_1)
        assert got == GEN_1_1_BARE

    def test_normalize_chain_idempotent(self, spark):
        a = one(spark, H.normalize_hebrew(F.col("s")), s=GEN_1_1)
        b = one(spark, H.normalize_hebrew(F.col("s")), s=a)
        assert a == b == GEN_1_1_BARE

    def test_letters_only_drops_latin_and_punct(self, spark):
        got = one(spark, H.hebrew_letters_only(F.col("s")), s="abc אָב׃, def")
        # nikkud qamats U+05B8 is outside א-ת and dropped here too
        assert got.replace(" ", "") == "אב"

    def test_hebrew_char_count_matches_python(self, spark):
        s = "hello בראשית world ברא"
        expected = sum(1 for c in s if "֐" <= c <= "׿")
        assert one(spark, H.hebrew_char_count(F.col("s")), s=s) == expected

    def test_char_class_map(self, spark):
        got = one(spark, H.char_class_map(F.col("s"), H.HEBREW_LETTER_CLASS), s="aבc")
        assert got == [0, 1, 0]

    def test_nfc_normalize_udf(self, spark):
        # Hebrew base+nikkud has no precomposed NFC forms (NFD == NFC), so
        # exercise the UDF with a Latin character that does: é.
        decomposed = "cafe\u0301"  # cafe + combining acute (NFD form)
        got = one(spark, H.nfc_normalize(F.col("s")), s=decomposed)
        assert got == "caf\u00e9"
        assert one(spark, H.is_nfc_normalized(F.col("s")), s=decomposed) is False
        assert one(spark, H.is_nfc_normalized(F.col("s")), s=GEN_1_1) is True

    def test_replacement_char_probe(self, spark):
        assert one(spark, H.has_replacement_char(F.col("s")), s="bad �") is True
        assert one(spark, H.has_replacement_char(F.col("s")), s=GEN_1_1) is False


class TestSimilarity:
    def test_levenshtein_ratio_known_values(self, spark):
        assert one(spark, S.levenshtein_ratio(F.col("a"), F.col("b")), a="abc", b="abc") == 1.0
        assert one(spark, S.levenshtein_ratio(F.col("a"), F.col("b")), a="", b="") == 1.0
        got = one(spark, S.levenshtein_ratio(F.col("a"), F.col("b")), a="kitten", b="sitting")
        assert math.isclose(got, 1 - 3 / 7)

    def test_token_sort_ratio_order_invariant(self, spark):
        got = one(
            spark, S.token_sort_ratio(F.col("a"), F.col("b")), a="world hello", b="hello world"
        )
        assert got == 1.0

    def test_token_set_jaccard(self, spark):
        got = one(spark, S.token_set_jaccard(F.col("a"), F.col("b")), a="a b c", b="b c d")
        assert math.isclose(got, 2 / 4)

    def test_dot_and_cosine(self, spark):
        df = spark.createDataFrame([([1.0, 2.0, 3.0], [4.0, 5.0, 6.0])], ["a", "b"])
        row = df.select(
            S.dot(F.col("a"), F.col("b")).alias("d"),
            S.cosine_similarity(F.col("a"), F.col("b")).alias("c"),
        ).first()
        assert row["d"] == 32.0
        expected = 32.0 / (math.sqrt(14) * math.sqrt(77))
        assert math.isclose(row["c"], expected, rel_tol=1e-9)

    def test_cosine_zero_vector_is_null(self, spark):
        df = spark.createDataFrame([([0.0, 0.0], [1.0, 2.0])], ["a", "b"])
        assert df.select(S.cosine_similarity(F.col("a"), F.col("b")).alias("c")).first()["c"] is None


class TestText:
    def test_whitespace_tokens_empty_string(self, spark):
        assert one(spark, T.whitespace_tokens(F.col("s")), s="") == []
        assert one(spark, T.whitespace_token_count(F.col("s")), s="  a  b ") == 2

    def test_bpe_ish_token_count(self, spark):
        # "don't stop 42" -> don | ' | t | stop | 4 | 2
        assert one(spark, T.bpe_ish_token_count(F.col("s")), s="don't stop 42") == 6

    def test_punct_ratio(self, spark):
        assert one(spark, T.punct_ratio(F.col("s")), s="ab, cd!") == round(2 / 6, 6)

    def test_stopword_ratio(self, spark):
        assert one(spark, T.stopword_ratio(F.col("s")), s="The cat and a dog") == round(3 / 5, 6)

    def test_predict_lang_markers(self, spark):
        assert one(spark, T.predict_lang(F.col("s")), s="the cat is on the mat") == "en"
        assert one(spark, T.predict_lang(F.col("s")), s="der Hund ist nicht da") == "de"
        assert one(spark, T.predict_lang(F.col("s")), s="你好世界") == "zh"
        assert one(spark, T.predict_lang(F.col("s")), s="zzz qqq") == "und"

    def test_doc_fingerprint_matches_python(self, spark):
        s = "the quick brown fox"

        def py_fp(text: str) -> int:
            h = 0
            for tok in text.split():
                th = 0
                for c in tok:
                    th = (th * 31 + ord(c)) % (2**31 - 1)
                h = (h * 31 + th) % (2**31 - 1)
            return h

        assert one(spark, T.doc_fingerprint(F.col("s")), s=s) == py_fp(s)
        # order sensitivity
        assert one(spark, T.doc_fingerprint(F.col("s")), s="fox brown quick the") != py_fp(s)

    def test_rev2_fingerprint_composition(self, spark):
        """Pins the _snapshot_flat composition identity (r14): appending
        ' rev2' appends exactly one token, so the edited fingerprint is
        (fp * HASH_BASE + _REV2_TOKEN_HASH) % HASH_MOD — the snapshot
        family relies on this to hash the corpus once instead of twice.
        Checks the pinned constant against the LIVE Spark token_hash and
        the identity end-to-end, including empty and trailing-space
        texts (the token-boundary edge cases)."""
        from hebrew_tutor_data_pipeline_spark.functions.hashing import (
            HASH_BASE,
            HASH_MOD,
            token_hash,
        )
        from hebrew_tutor_data_pipeline_spark.plans.catalog_ml import (
            _REV2_TOKEN_HASH,
        )

        assert one(spark, token_hash(F.col("s")), s="rev2") == _REV2_TOKEN_HASH
        for s in ["the quick brown fox", "", "  ", "one", "trailing space "]:
            fp = one(spark, T.doc_fingerprint(F.col("s")), s=s)
            fp_edit = one(spark, T.doc_fingerprint(F.col("s")), s=s + " rev2")
            assert fp_edit == (fp * HASH_BASE + _REV2_TOKEN_HASH) % HASH_MOD

    def test_word_ngrams(self, spark):
        toks = F.split(F.col("s"), " ")
        got = one(spark, T.word_ngrams(toks, 2), s="a b c")
        assert got == ["a b", "b c"]
        got_short = one(spark, T.word_ngrams(toks, 5), s="a b")
        assert got_short == ["a b"]


class TestTimeops:
    """NTZ-safe time helpers (functions/timeops.py) — the policy layer
    the round-3 TIMESTAMP_NTZ regression showed was missing. Each helper
    must produce identical epochs for the SAME instant expressed as LTZ,
    NTZ (session tz pinned UTC), DATE, and raw numeric."""

    def _frames(self, spark):
        sql = """
        SELECT TIMESTAMP '2024-03-01 12:30:45.123456' AS ltz,
               TIMESTAMP_NTZ '2024-03-01 12:30:45.123456' AS ntz,
               DATE '2024-03-01' AS d,
               CAST(1709296245.123456 AS DOUBLE) AS num
        """
        return spark.sql(sql)

    def test_epoch_seconds_all_domains(self, spark):
        from hebrew_tutor_data_pipeline_spark.functions.timeops import epoch_seconds

        df = self._frames(spark)
        row = df.select(
            epoch_seconds(df, "ltz").alias("a"),
            epoch_seconds(df, "ntz").alias("b"),
            epoch_seconds(df, "d").alias("c"),
            epoch_seconds(df, "num").alias("e"),
        ).first()
        assert row["a"] == row["b"] == row["e"]  # same instant, all domains
        assert abs(row["a"] - 1709296245.123456) < 1e-6
        assert row["c"] == 1709251200.0  # midnight UTC of that date

    def test_epoch_micros_exact_and_ntz_legal(self, spark):
        from hebrew_tutor_data_pipeline_spark.functions.timeops import epoch_micros

        df = self._frames(spark)
        row = df.select(
            epoch_micros(df, "ltz").alias("a"),
            epoch_micros(df, "ntz").alias("b"),
            epoch_micros(df, "num").alias("c"),
        ).first()
        assert row["a"] == row["b"] == 1709296245123456  # exact integer µs
        # numeric columns are epoch seconds → micros, ROUNDED (truncation
        # would floor 2.000005*1e6 = 2000004.99…98 to 2000004)
        assert row["c"] == 1709296245123456

    def test_ensure_ltz_normalizes_and_noops(self, spark):
        from hebrew_tutor_data_pipeline_spark.functions.timeops import ensure_ltz

        df = self._frames(spark)
        out = ensure_ltz(ensure_ltz(df, "ntz"), "ltz")  # ntz fixed, ltz no-op
        assert dict(out.dtypes)["ntz"] == "timestamp"
        assert dict(out.dtypes)["ltz"] == "timestamp"
        r = out.select("ltz", "ntz").first()
        assert r["ltz"] == r["ntz"]


class TestPiiScrub:
    def test_redact_all_kinds(self, spark):
        from pyspark.sql import functions as F

        from hebrew_tutor_data_pipeline_spark.functions.text import (
            pii_count,
            redact_pii,
        )

        s = (
            "mail a.user+tag@corp.example.com or b@x.io, "
            "see https://example.org/a?b=1 and http://t.co/xyz "
            "call +1-555-0100 or +972-123-4567 done"
        )
        df = spark.createDataFrame([(s,)], ["t"])
        row = df.select(
            redact_pii(F.col("t")).alias("r"),
            pii_count(F.col("t"), "url").alias("u"),
            pii_count(F.col("t"), "email").alias("e"),
            pii_count(F.col("t"), "phone").alias("p"),
        ).first()
        assert row["u"] == 2 and row["e"] == 2 and row["p"] == 2
        assert row["r"] == (
            "mail <EMAIL> or <EMAIL>, see <URL> and <URL> "
            "call <PHONE> or <PHONE> done"
        )

    def test_url_rule_consumes_embedded_email(self, spark):
        from pyspark.sql import functions as F

        from hebrew_tutor_data_pipeline_spark.functions.text import redact_pii

        df = spark.createDataFrame(
            [("go https://u@host.example.com/path now",)], ["t"]
        )
        assert df.select(redact_pii(F.col("t")).alias("r")).first()["r"] == (
            "go <URL> now"
        )

    def test_clean_text_unchanged(self, spark):
        from pyspark.sql import functions as F

        from hebrew_tutor_data_pipeline_spark.functions.text import redact_pii

        s = "plain words only, no contact details at 5pm-ish"
        df = spark.createDataFrame([(s,)], ["t"])
        assert df.select(redact_pii(F.col("t")).alias("r")).first()["r"] == s


class TestRepetitionSignals:
    def test_top_and_duplicate_ngram_fractions(self, spark):
        from pyspark.sql import functions as F

        from hebrew_tutor_data_pipeline_spark.functions.text import (
            duplicate_ngram_fraction,
            top_ngram_fraction,
            whitespace_tokens,
        )

        rows = [
            # "a b a b a": bigrams [a b, b a, a b, b a] -> top2 = 2/4,
            # trigrams [a b a, b a b, a b a] -> 2 of 3 instances duplicated
            (1, "a b a b a"),
            # all-distinct tokens: top bigram appears once, no dup trigrams
            (2, "q w e r t y"),
            # single token (shorter than n): one joined gram, top2 = 1.0
            (3, "solo"),
        ]
        from hebrew_tutor_data_pipeline_spark.functions.text import word_ngrams

        df = spark.createDataFrame(rows, ["i", "t"]).withColumn(
            "_toks", whitespace_tokens(F.col("t"))
        )
        staged = df.withColumn("_g2", word_ngrams(F.col("_toks"), 2)).withColumn(
            "_g3", word_ngrams(F.col("_toks"), 3)
        )
        out = {
            r["i"]: (r["t2"], r["d3"])
            for r in staged.select(
                "i",
                top_ngram_fraction(F.col("_g2")).alias("t2"),
                duplicate_ngram_fraction(F.col("_g3")).alias("d3"),
            ).collect()
        }
        assert out[1] == (0.5, round(2 / 3, 6))
        assert out[2] == (0.2, 0.0)
        assert out[3] == (1.0, 0.0)


class TestBm25Query:
    def test_bm25_ordering_invariants(self, spark):
        """On controlled docs: a doc with more query-term hits (same
        length) scores higher; a longer doc with the SAME hits scores
        lower (length normalization); docs without any term are absent."""
        from hebrew_tutor_data_pipeline_spark.plans.catalog_ml import (
            bm25_keyword_topk,
        )
        import tempfile, os

        rows = [
            (0, "spark spark join filler filler filler", "en", "s", 1),
            (1, "spark filler filler filler filler filler", "en", "s", 1),
            (2, "spark filler filler filler filler filler filler filler filler filler filler filler", "en", "s", 1),
            (3, "nothing relevant here at all whatsoever", "en", "s", 1),
        ]
        with tempfile.TemporaryDirectory() as td:
            spark.createDataFrame(
                rows, ["doc_id", "text", "lang", "source", "n_chars"]
            ).write.parquet(os.path.join(td, "documents.parquet"))
            got = {r["doc_id"]: r["bm25"] for r in bm25_keyword_topk(spark, td).collect()}
        assert 3 not in got
        assert got[0] > got[1] > got[2]


class TestReviewBatch4Guards:
    def test_tokenizer_count_equals_size_on_edge_whitespace(self, spark):
        """SQL trim strips only spaces: tab/newline-edged text used to
        carry empty edge tokens, desyncing size(tokens) from the
        regexp_count twin and every DuckDB oracle."""
        from hebrew_tutor_data_pipeline_spark.functions.text import (
            whitespace_token_count,
            whitespace_tokens,
        )

        df = spark.createDataFrame(
            [("\tthe end",), ("\t",), ("",), ("  a  b  ",), ("x\n",)], ["t"]
        )
        rows = df.select(
            F.size(whitespace_tokens(F.col("t"))).alias("sz"),
            whitespace_token_count(F.col("t")).alias("ct"),
            whitespace_tokens(F.col("t")).alias("toks"),
        ).collect()
        for r in rows:
            assert r["sz"] == r["ct"], r
        assert rows[0]["toks"] == ["the", "end"]
        assert rows[1]["toks"] == [] and rows[2]["toks"] == []

    def test_levenshtein_ratio_null_propagates(self, spark):
        from hebrew_tutor_data_pipeline_spark.functions.similarity import (
            levenshtein_ratio,
        )

        df = spark.createDataFrame([(None, ""), ("", ""), ("ab", None)], ["a", "b"])
        got = [
            r["r"]
            for r in df.select(
                levenshtein_ratio(F.col("a"), F.col("b")).alias("r")
            ).collect()
        ]
        assert got[0] is None  # NULL vs '' is NOT a perfect match
        assert got[1] == 1.0
        assert got[2] is None

    def test_punct_ratio_unicode_letters_not_punctuation(self, spark):
        from hebrew_tutor_data_pipeline_spark.functions.text import punct_ratio

        df = spark.createDataFrame(
            [("שלום עולם",), ("über!",), ("a,b",)], ["t"]
        )
        got = [r["p"] for r in df.select(punct_ratio(F.col("t")).alias("p")).collect()]
        assert got[0] == 0.0  # Hebrew letters are letters, not punctuation
        assert got[1] == 0.2  # 1 of 5 non-space chars
        assert got[2] == round(1 / 3, 6)

    def test_stopword_ratio_escapes_metacharacters(self, spark):
        from hebrew_tutor_data_pipeline_spark.functions.text import stopword_ratio

        df = spark.createDataFrame([("u-s- officials said",)], ["t"])
        got = df.select(
            stopword_ratio(F.col("t"), stopwords=("u.s.",)).alias("r")
        ).first()["r"]
        assert got == 0.0  # '.' must not match '-'

    def test_classifier_weights_within_documented_range(self):
        from hebrew_tutor_data_pipeline_spark.functions.text import (
            classifier_weights,
        )

        w = classifier_weights(4096)
        assert all(-0.5 <= x < 0.5 for x in w)

    def test_transcribe_words_null_rows_emit_nothing(self, spark):
        from hebrew_tutor_data_pipeline_spark.operators.transcribe import (
            transcribe_words,
        )

        df = spark.createDataFrame(
            [("b1", 1, "one two three", 3000), ("b2", 2, None, 3000),
             ("b3", 3, "x y", None)],
            "book string, chapter int, text string, duration_ms long",
        )
        got = transcribe_words(df, ["book", "chapter"]).collect()
        assert {r["book"] for r in got} == {"b1"}  # null rows: zero words, no crash

    def test_bpe_fold_empty_tokens_stay_empty(self, spark):
        from hebrew_tutor_data_pipeline_spark.operators.bpe import merge_pair_fold

        df = spark.createDataFrame([([],), (["a", "b"],)], ["toks"])
        got = [
            r["m"]
            for r in df.select(
                merge_pair_fold(F.col("toks"), "a", "b").alias("m")
            ).collect()
        ]
        assert got[0] == []  # not [''] (n_fused would go negative)
        assert got[1] == ["a+b"]
