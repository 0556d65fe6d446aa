"""Catalog part 3 — the Hebrew-corpus domain pipeline and remaining
scalar-function coverage (SURVEY.md §2 tags S1 P1 P2 P4 P6 J2 J6 W6
F4 F8–F12 F17).

The corpus queries run over the committed deterministic fixture
``tests/fixtures/bible_corpus.json`` (same nested
``Dict[book, [[chapter [verse [word]]]]]`` shape as the reference's
``hebrew_bible_with_nikkud.json``, including an 'Aramaic' key the P2
filter must drop) — they take ``sf_dir`` like every query but read the
fixture, since the corpus is a fixed-size dimension, not a fact table.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import similarity
from ..operators import alignment
from ..sources.readers import read_nested_json_corpus
from .catalog import T, _register

FIXTURE_CORPUS = str(
    Path(__file__).resolve().parents[2] / "tests" / "fixtures" / "bible_corpus.json"
)
FIXTURE_AUDIO_TREE = str(
    Path(__file__).resolve().parents[2] / "tests" / "fixtures" / "audio_tree"
)

# Shared oracle CTE: nested JSON -> (book, chapter, verse_num, words)
_CORPUS_SQL = f"""
raw AS (SELECT json(content) AS j FROM read_text('{FIXTURE_CORPUS}')),
books AS (SELECT unnest(json_keys(j)) AS book, j FROM raw),
parsed AS (
  SELECT book,
         from_json(json_extract(j, '$."' || book || '"'), '[[["VARCHAR"]]]') AS chapters
  FROM books WHERE book <> 'Aramaic'),
chaps AS (
  SELECT book, unnest(chapters) AS verses,
         generate_subscripts(chapters, 1) AS chapter
  FROM parsed),
vs AS (
  SELECT book, chapter, unnest(verses) AS words,
         generate_subscripts(verses, 1) AS verse_num
  FROM chaps)
"""


def corpus_verses_df(spark: SparkSession) -> DataFrame:
    """S1+P1+P2: nested corpus scan → one row per verse, 1-indexed
    (`hebrew_alignment_tool.py:137-206`). Keeps the words array for
    downstream W3 spreading."""
    stacked = read_nested_json_corpus(spark, FIXTURE_CORPUS)
    return (
        stacked.select("book", F.posexplode("chapters").alias("c0", "verses"))
        .select(
            "book",
            (F.col("c0") + 1).alias("chapter"),
            F.posexplode("verses").alias("v0", "words"),
        )
        .select(
            "book",
            "chapter",
            (F.col("v0") + 1).alias("verse_num"),
            F.col("words"),
        )
    )


@_register(
    "corpus_verses",
    oracle=f"""
WITH {_CORPUS_SQL}
SELECT book, chapter, verse_num,
       array_to_string(words, ' ') AS text,
       len(words) AS word_count
FROM vs
""",
    tags=("S1", "P1", "P2", "F4", "A3"),
)
def corpus_verses(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 nested JSON corpus scan + P1 double posexplode with 1-indexing
    + P2 'Aramaic' key filter + F4 array join — the reference's
    `_extract_chapter_text` as one declarative plan."""
    return corpus_verses_df(spark).select(
        "book",
        "chapter",
        "verse_num",
        F.concat_ws(" ", "words").alias("text"),
        F.size("words").alias("word_count"),
    )


@_register(
    "corpus_word_spread",
    oracle=f"""
WITH {_CORPUS_SQL},
wc AS (
  SELECT book, chapter, verse_num, words, len(words) AS word_count
  FROM vs WHERE chapter <= 3),
dur AS (SELECT *, 60.0 + 10.0 * chapter AS total_duration FROM wc),
alloc AS (
  SELECT book, chapter, verse_num, words, word_count,
         word_count / sum(word_count) OVER (PARTITION BY book, chapter)
             * total_duration AS dur
  FROM dur),
bounds AS (
  SELECT book, chapter, verse_num, words, word_count, dur,
         round(coalesce(sum(dur) OVER (PARTITION BY book, chapter
                        ORDER BY verse_num
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + 0.0000001, 2) AS start
  FROM alloc),
bounds2 AS (
  SELECT *, round(start + dur + 0.0000001, 2) AS "end" FROM bounds)
SELECT book, chapter, verse_num,
       unnest(words) AS word,
       generate_subscripts(words, 1) AS word_pos,
       round(start + (generate_subscripts(words, 1) - 1)
             * (("end" - start) / word_count) + 0.0000001, 2) AS word_start,
       round(start + generate_subscripts(words, 1)
             * (("end" - start) / word_count) + 0.0000001, 2) AS word_end
FROM bounds2
""",
    tags=("W2", "W3", "P4", "P6", "J1"),
    bench=True,
)
def corpus_word_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full estimation-only alignment pipeline (the reference's only
    929/929 path, `scripts/hebrew_alignment_clean_fixed.py`): verses →
    P4 chapter range filter → word-density W2 allocation against a
    per-chapter duration dim → W3 uniform word spread. Entirely
    declarative SQL — no UDFs, the Catalyst-native rewrite of
    `hebrew_alignment_optimized.py:494-554`."""
    wc = (
        corpus_verses_df(spark)
        .filter(F.col("chapter") <= 3)  # P4 range predicate
        .withColumn("word_count", F.size("words"))
        .withColumn("total_duration", F.lit(60.0) + F.lit(10.0) * F.col("chapter"))
    )
    alloc = alignment.allocate_proportional(
        wc,
        group_cols=["book", "chapter"],
        order_col="verse_num",
        weight_col="word_count",
        total_col="total_duration",
    )
    spread = alignment.spread_uniform(
        alloc.select("book", "chapter", "verse_num", "words", "word_count", "start", "end"),
        "words",
        "start",
        "end",
    )
    return spread.select(
        "book", "chapter", "verse_num", "word", "word_pos", "word_start", "word_end"
    )


@_register(
    "audio_inventory",
    oracle=f"""
SELECT regexp_extract(filename, '(\\d+)-([A-Za-z]+)_(\\d+)\\.mp3$', 2) AS abbr,
       CAST(regexp_extract(filename, '(\\d+)-([A-Za-z]+)_(\\d+)\\.mp3$', 3) AS INTEGER)
           AS chapter,
       size AS length
FROM read_blob('{FIXTURE_AUDIO_TREE}/*/*.mp3')
WHERE size >= 1024
""",
    tags=("S2", "S3", "F7", "P3"),
)
def audio_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 binary glob scan of the NN_Book/NN-Abbr_CC.mp3 tree with S3/F7
    filename-key parsing (`scripts/hebrew_audio_trimmer.py:270-297`,
    `fixed_hebrew_aligner.py:194-203`). The binaryFile source lists
    partition-parallel; the length predicate (P3 validity gate ≥1 KB)
    stays in the scan."""
    from ..sources.readers import read_binary_files

    files = read_binary_files(spark, FIXTURE_AUDIO_TREE, glob="*.mp3")
    return files.filter(F.col("length") >= 1024).select(
        F.regexp_extract("path", r"(\d+)-([A-Za-z]+)_(\d+)\.mp3$", 2).alias("abbr"),
        F.regexp_extract("path", r"(\d+)-([A-Za-z]+)_(\d+)\.mp3$", 3)
        .cast("int")
        .alias("chapter"),
        F.col("length"),
    )


@_register(
    "alignment_sink_roundtrip",
    oracle=f"""
WITH {_CORPUS_SQL}
SELECT book, chapter, verse_num, array_to_string(words, ' ') AS text
FROM vs WHERE book IN ('Gen', 'Obad')
""",
    tags=("S7", "S8"),
)
def alignment_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7 partitioned JSON sink proven by round-trip: write the corpus
    verses partitionBy(book) to a scratch dir (Spark's FileCommitProtocol
    = the reference's atomic tmp+rename, S8), read the directory back,
    return the rows — which must equal what was written
    (`scripts/hebrew_alignment_tool_gpu.py:589-609`)."""
    import tempfile

    out = str(Path(tempfile.gettempdir()) / "htdp_spark_alignment_sink")
    verses = corpus_verses_df(spark).filter(F.col("book").isin("Gen", "Obad")).select(
        "book", "chapter", "verse_num", F.concat_ws(" ", "words").alias("text")
    )
    verses.write.partitionBy("book").mode("overwrite").json(out)
    return (
        spark.read.schema("chapter int, verse_num int, text string, book string")
        .json(out)
        .select("book", "chapter", "verse_num", "text")
    )


@_register(
    "nation_code_fallback",
    oracle="""
WITH exact_map(name, code) AS (
  VALUES ('ALGERIA', 'DZ'), ('BRAZIL', 'BR'), ('CANADA', 'CA'), ('EGYPT', 'EG')),
alt_map(alias, code) AS (
  VALUES ('france', 'FR'), ('germany', 'DE'), ('india', 'IN'))
SELECT n.n_nationkey, n.n_name,
       coalesce(e.code, a.code, 'XX') AS code
FROM nation n
LEFT JOIN exact_map e ON n.n_name = e.name
LEFT JOIN alt_map a ON lower(n.n_name) = a.alias
""",
    tags=("J2", "J1"),
)
def nation_code_fallback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 multi-key fallback lookup: exact key → alternate map →
    case-insensitive, folded to one coalesce of broadcast left joins
    (`scripts/hebrew_alignment_tool_gpu.py:269-295`)."""
    n = T(spark, sf_dir, "nation")
    exact = spark.createDataFrame(
        [("ALGERIA", "DZ"), ("BRAZIL", "BR"), ("CANADA", "CA"), ("EGYPT", "EG")],
        ["name", "ecode"],
    )
    alt = spark.createDataFrame(
        [("france", "FR"), ("germany", "DE"), ("india", "IN")], ["alias", "acode"]
    )
    return (
        n.join(F.broadcast(exact), n["n_name"] == exact["name"], "left")
        .join(F.broadcast(alt), F.lower(n["n_name"]) == alt["alias"], "left")
        .select(
            "n_nationkey",
            "n_name",
            F.coalesce("ecode", "acode", F.lit("XX")).alias("code"),
        )
    )


@_register(
    "user_first_last_event",
    oracle="""
SELECT user_id,
       arg_min(event_type, ts) AS first_type,
       arg_max(event_type, ts) AS last_type,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS first_ts,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS last_ts
FROM events
GROUP BY user_id
""",
    tags=("W6", "F11", "O4"),
)
def user_first_last_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W6 first/last within group + F11 timestamp formatting
    (`fixed_hebrew_aligner.py:543-551`; `hebrew_audio_trimmer.py:193`).
    min_by/max_by == Spark's argmin/argmax aggregate — one shuffle, no
    window materialization."""
    e = T(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        F.min_by("event_type", "ts").alias("first_type"),
        F.max_by("event_type", "ts").alias("last_type"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("first_ts"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("last_ts"),
    )


@_register(
    "lineitem_unit_math",
    oracle="""
SELECT l_orderkey, l_linenumber, l_partkey,
       CAST(epoch(l_shipdate) AS BIGINT) AS ship_epoch,
       floor(l_extendedprice / l_quantity * 100 + 0.5) / 100 AS unit_price,
       least(greatest(l_quantity, 10.0), 40.0) AS clamped_qty,
       floor(l_extendedprice * (1 - l_discount) * 10 + 0.5) / 10000 AS net_k
FROM lineitem
WHERE l_quantity BETWEEN 1 AND 50
""",
    tags=("F8", "F9", "F10", "P4", "P6"),
)
def lineitem_unit_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8 unit conversions (ticks→seconds analog: timestamp→epoch), F9
    rounding, F10 greatest/least clamping, P4 range predicate — the
    scalar-math surface of `fixed_hebrew_aligner.py:427-429` /
    `scripts/hebrew_audio_trimmer.py:110-173`."""
    li = T(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_quantity").between(1, 50)).select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        F.unix_timestamp("l_shipdate").alias("ship_epoch"),
        # floor(x*10^k + 0.5) instead of round(): deterministic on the
        # double bits in every engine, immune to .005-boundary values
        # that price/quantity division produces constantly
        (F.floor(F.col("l_extendedprice") / F.col("l_quantity") * 100 + 0.5) / 100)
        .alias("unit_price"),
        F.least(F.greatest(F.col("l_quantity"), F.lit(10.0)), F.lit(40.0)).alias(
            "clamped_qty"
        ),
        (
            F.floor(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10 + 0.5
            )
            / 10000
        ).alias("net_k"),
    )


@_register(
    "part_name_similarity",
    oracle="""
WITH ref AS (SELECT p_brand, min(p_name) AS ref_name FROM part GROUP BY p_brand),
scored AS (
  SELECT p.p_partkey, p.p_brand, p.p_name, r.ref_name,
         round(CASE WHEN greatest(len(p.p_name), len(r.ref_name)) = 0 THEN 1.0
               ELSE 1.0 - levenshtein(p.p_name, r.ref_name)
                          / greatest(len(p.p_name), len(r.ref_name)) END, 6) AS sim
  FROM part p JOIN ref r ON p.p_brand = r.p_brand),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY p_brand
                               ORDER BY sim DESC, p_partkey ASC) AS rnk
  FROM scored)
SELECT p_partkey, p_brand, sim, rnk FROM ranked WHERE rnk <= 5
""",
    tags=("F12", "J6", "O4"),
)
def part_name_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6 group-vs-reference fuzzy scoring + F12 levenshtein ratio + O4
    argmax ranking: every member scored against its group's reference
    text, best-k kept (`scripts/hebrew_alignment_tool_gpu.py:519-587`).
    The reference text per group is a broadcast dimension; scores are
    the built-in JVM levenshtein — no Python in the loop."""
    p = T(spark, sf_dir, "part")
    ref = p.groupBy("p_brand").agg(F.min("p_name").alias("ref_name"))
    scored = p.join(F.broadcast(ref), "p_brand").select(
        "p_partkey",
        "p_brand",
        F.round(
            similarity.levenshtein_ratio(F.col("p_name"), F.col("ref_name")), 6
        ).alias("sim"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("p_brand").orderBy(F.col("sim").desc(), F.col("p_partkey"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select("p_partkey", "p_brand", "sim", "rnk")
    )


@_register(
    "doc_vowel_class_map",
    oracle="""
SELECT doc_id,
       coalesce(list_aggregate(
           [CASE WHEN regexp_matches(c, '^[aeiou]$') THEN '1' ELSE '0' END
            FOR c IN string_split(substr(lower(text), 1, 16), '')],
           'string_agg', ''), '') AS vowel_map
FROM documents
WHERE doc_id < 100
""",
    tags=("F17", "P4", "P6"),
)
def doc_vowel_class_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F17 per-character 0/1 class map as a higher-order transform
    (`scripts/convert_hebrew_grammar_pdf.py:123-124` nikud/dagesh maps;
    vowels stand in for nikkud on the ASCII documents table).

    The map is serialized to a '0101...' bitstring: oracle-checked
    queries must never emit array-typed columns (the driver's
    canonicalizer cannot hash lists). Same F17 semantics, hashable
    output; the array form stays covered by unit tests."""
    from ..functions.hebrew import char_class_map

    d = T(spark, sf_dir, "documents")
    return d.filter(F.col("doc_id") < 100).select(
        "doc_id",
        F.concat_ws(
            "", char_class_map(F.substring(F.lower("text"), 1, 16), "[aeiou]").cast("array<string>")
        ).alias("vowel_map"),
    )


@_register(
    "pdf_page_scan",
    oracle=None,  # digest-derived fake OCR has no SQL twin; rows-only check
    tags=("S11", "S12", "U7"),
)
def pdf_page_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S11/S12/U7: binary scan → per-page render/OCR rows (stubbed codec,
    real mapInPandas plumbing; `scripts/convert_hebrew_grammar_pdf.py:34-86`).
    Deterministic fake pages, so the rows-only check is stable."""
    from ..operators.multimodal import pdf_pages
    from ..sources.readers import read_binary_files

    files = read_binary_files(spark, FIXTURE_AUDIO_TREE, glob="*.mp3")
    return (
        pdf_pages(files)
        .select(
            F.regexp_extract("path", r"([^/]+)$", 1).alias("filename"),
            "page_number",
            F.length("text").alias("text_len"),
            F.size("nikud_map").alias("map_len"),
        )
        .orderBy("filename", "page_number")
    )


@_register(
    "video_frame_index",
    oracle=None,  # digest-derived fake frames have no SQL twin; rows-only
    tags=("U9", "multimodal"),
)
def video_frame_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal frame-sample plumbing: binary → (file, frame_idx, t)
    index rows via mapInPandas (stubbed decoder, U9 ffmpeg slot)."""
    from ..operators.multimodal import video_frame_sample
    from ..sources.readers import read_binary_files

    files = read_binary_files(spark, FIXTURE_AUDIO_TREE, glob="*.mp3")
    return (
        video_frame_sample(files, every_s=0.5)
        .select(
            F.regexp_extract("path", r"([^/]+)$", 1).alias("filename"),
            "frame_idx",
            "t",
        )
        .orderBy("filename", "frame_idx")
    )
