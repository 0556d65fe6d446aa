"""Source/sink tests (SURVEY.md §2.1 S1/S2/S7/S9): binary-file glob
scan, nested JSON corpus reader, partitioned JSON sink round-trip."""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import functions as F

from hebrew_tutor_data_pipeline_spark.sources.readers import (
    expected_grid,
    read_binary_files,
    read_nested_json_corpus,
)

FIXTURE_CORPUS = str(
    Path(__file__).resolve().parent / "fixtures" / "bible_corpus.json"
)


class TestLoadTableTimeDomain:
    """load_table must present ONE time domain regardless of how the
    driver regenerates the parquet (TIMESTAMP(NANOS) in rounds 1-2,
    tz-naive micros → TIMESTAMP_NTZ in round 3, possibly tz-aware
    later): every time-like column arrives as TIMESTAMP (LTZ), on which
    cast("double")/unix_micros are legal. The round-3 NTZ regression
    (sessionize/progress hard-erroring on regenerated testdata) is the
    failure this pins down."""

    def test_no_ntz_or_raw_long_timestamps(self, spark):
        from pyspark.sql.types import TimestampNTZType

        from hebrew_tutor_data_pipeline_spark.sources.readers import (
            TPCH_TABLES,
            load_table,
        )

        time_cols = {
            "events": ["ts"],
            "orders": ["o_orderdate"],
            "lineitem": ["l_shipdate"],
        }
        for t in TPCH_TABLES:
            df = load_table(spark, "/root/testdata/sf0.001", t)
            ntz = [
                f.name
                for f in df.schema.fields
                if isinstance(f.dataType, TimestampNTZType)
            ]
            assert not ntz, f"{t}: NTZ columns leaked through load_table: {ntz}"
            for c in time_cols.get(t, []):
                assert dict(df.dtypes)[c] == "timestamp", (t, c, dict(df.dtypes)[c])
                # the operations the round-3 regression broke must be legal
                df.select(
                    F.col(c).cast("double"), F.expr(f"unix_micros(`{c}`)")
                ).limit(1).collect()


class TestBinaryScan:
    def make_tree(self, tmp_path):
        """NN_BookName/NN-Abbr_CC.mp3 layout like the reference corpus
        (`Hebrew Audio Trimmer Tool - As-Built Documentation.md:95-106`)."""
        for book_num, name, abbr, chapters in [
            (1, "Genesis", "Gen", 3),
            (18, "Obadiah", "Obad", 1),
        ]:
            d = tmp_path / f"{book_num:02d}_{name}"
            d.mkdir()
            for c in range(1, chapters + 1):
                (d / f"{book_num:02d}-{abbr}_{c:02d}.mp3").write_bytes(
                    b"\xff\xfb" + bytes(100)
                )
            (d / "notes.txt").write_text("not audio")
        return tmp_path

    def test_glob_scan_inventory(self, spark, tmp_path):
        root = self.make_tree(tmp_path)
        df = read_binary_files(spark, str(root), glob="*.mp3")
        rows = df.select("path", "length").collect()
        assert len(rows) == 4  # txt file excluded by the glob
        assert all(r["length"] == 102 for r in rows)
        # S3: parse (book_num, abbr, chapter) from the computed filename
        parsed = df.select(
            F.regexp_extract("path", r"(\d+)-([A-Za-z]+)_(\d+)\.mp3$", 2).alias(
                "abbr"
            ),
            F.regexp_extract("path", r"(\d+)-([A-Za-z]+)_(\d+)\.mp3$", 3)
            .cast("int")
            .alias("chapter"),
        )
        got = sorted((r["abbr"], r["chapter"]) for r in parsed.collect())
        assert got == [("Gen", 1), ("Gen", 2), ("Gen", 3), ("Obad", 1)]

    def test_missing_chapter_audit(self, spark, tmp_path):
        """J9: expected grid anti-joined against the actual inventory
        (`fixed_hebrew_aligner.py:176-192`)."""
        root = self.make_tree(tmp_path)
        # remove one file to create a hole
        (root / "01_Genesis" / "01-Gen_02.mp3").unlink()
        actual = read_binary_files(spark, str(root), glob="*.mp3").select(
            F.regexp_extract("path", r"(\d+)-([A-Za-z]+)_(\d+)\.mp3$", 2).alias("abbr"),
            F.regexp_extract("path", r"(\d+)-([A-Za-z]+)_(\d+)\.mp3$", 3)
            .cast("int")
            .alias("chapter"),
        )
        expected = expected_grid(
            spark.createDataFrame([("Gen", 3), ("Obad", 1)], ["abbr", "n_chapters"]),
            "abbr",
            "n_chapters",
        )
        missing = expected.join(actual, ["abbr", "chapter"], "left_anti").collect()
        assert [(r["abbr"], r["chapter"]) for r in missing] == [("Gen", 2)]


class TestCorpusReader:
    def test_aramaic_dropped_and_shape(self, spark):
        df = read_nested_json_corpus(spark, FIXTURE_CORPUS)
        books = {r["book"] for r in df.select("book").collect()}
        assert "Aramaic" not in books
        assert {"Gen", "Exod", "Ps", "Obad", "Ruth"} == books


class TestPartitionedJsonSink:
    def test_partitioned_roundtrip(self, spark, tmp_path):
        """S7: one directory per book, JSON rows inside, UTF-8 Hebrew
        preserved byte-for-byte (`scripts/hebrew_alignment_tool_gpu.py:589-609`
        + the encoding round-trip golden test,
        `scripts/hebrew_encoding_test.py:8-80`)."""
        out = str(tmp_path / "alignments")
        df = spark.createDataFrame(
            [
                ("Gen", 1, 1, "בְּרֵאשִׁית בָּרָא", 0.0, 2.5),
                ("Gen", 1, 2, "וְהָאָרֶץ הָיְתָה", 2.5, 5.0),
                ("Obad", 1, 1, "חֲזוֹן עֹבַדְיָה", 0.0, 3.0),
            ],
            ["book", "chapter", "verse_num", "text", "start", "end"],
        )
        df.write.partitionBy("book").mode("overwrite").json(out)
        # per-book directories exist (the reference's output layout)
        subdirs = {p.name for p in Path(out).iterdir() if p.is_dir()}
        assert subdirs == {"book=Gen", "book=Obad"}
        back = spark.read.json(out)
        assert back.count() == 3
        got = {
            (r["book"], r["chapter"], r["verse_num"], r["text"])
            for r in back.collect()
        }
        assert ("Gen", 1, 1, "בְּרֵאשִׁית בָּרָא") in got
        assert ("Obad", 1, 1, "חֲזוֹן עֹבַדְיָה") in got

    def test_config_upsert_roundtrip(self, spark, tmp_path):
        """S9: the trim-config store maintained as overwrite-after-upsert
        (`scripts/hebrew_audio_trimmer.py:67-87,186-195`)."""
        from hebrew_tutor_data_pipeline_spark.operators.upsert import (
            last_wins_upsert,
        )

        store = str(tmp_path / "trim_config")
        state = spark.createDataFrame(
            [("a.mp3", 1.0, 2.5), ("b.mp3", 1.0, 4.0)], ["path", "ts", "trim_start"]
        )
        state.write.mode("overwrite").json(store)
        updates = spark.createDataFrame(
            [("a.mp3", 2.0, 3.0), ("c.mp3", 2.0, 1.0)], ["path", "ts", "trim_start"]
        )
        merged = last_wins_upsert(
            spark.read.schema("path string, ts double, trim_start double").json(store),
            updates,
            ["path"],
            "ts",
        )
        out2 = str(tmp_path / "trim_config_v2")
        merged.write.mode("overwrite").json(out2)
        back = {
            r["path"]: r["trim_start"]
            for r in spark.read.schema(
                "path string, ts double, trim_start double"
            ).json(out2).collect()
        }
        assert back == {"a.mp3": 3.0, "b.mp3": 4.0, "c.mp3": 1.0}


class TestLocalFirstScan:
    def test_local_wins_remote_fills(self, spark, tmp_path):
        from hebrew_tutor_data_pipeline_spark.sources.readers import local_first_scan

        loc = tmp_path / "loc" / "01_Genesis"
        rem = tmp_path / "rem" / "01_Genesis"
        loc.mkdir(parents=True)
        rem.mkdir(parents=True)
        (loc / "01-Gen_01.mp3").write_bytes(b"L" * 100)   # both: local wins
        (rem / "01-Gen_01.mp3").write_bytes(b"R" * 999)
        (rem / "01-Gen_02.mp3").write_bytes(b"R" * 50)    # remote only
        got = {
            r["filename"]: (r["source"], r["length"])
            for r in local_first_scan(
                spark, str(tmp_path / "loc"), str(tmp_path / "rem")
            ).collect()
        }
        assert got == {
            "01-Gen_01.mp3": ("local", 100),
            "01-Gen_02.mp3": ("remote", 50),
        }

    def test_relkey_anchors_root_to_separator(self, spark, tmp_path):
        """An ancestor directory that merely ENDS with the scan root's
        basename (…/notebooks/ above a root named books) must not
        swallow the match: without the `/` anchor the relative key kept
        a spurious `books/` prefix on the local side and the same file
        split into two rows instead of resolving local-first."""
        from hebrew_tutor_data_pipeline_spark.sources.readers import local_first_scan

        loc = tmp_path / "my_notebooks" / "books" / "ch1"
        rem = tmp_path / "rem" / "books" / "ch1"
        loc.mkdir(parents=True)
        rem.mkdir(parents=True)
        (loc / "a.mp3").write_bytes(b"L" * 7)
        (rem / "a.mp3").write_bytes(b"R" * 99)
        rows = local_first_scan(
            spark,
            str(tmp_path / "my_notebooks" / "books"),
            str(tmp_path / "rem" / "books"),
        ).collect()
        assert [(r["source"], r["length"]) for r in rows] == [("local", 7)]

    def test_relkey_ignores_ancestor_named_like_root(self, spark, tmp_path):
        """An ANCESTOR directory component exactly equal to the scan
        root's basename (…/books/proj/books vs …/rem/books) must not
        become the relkey anchor: the first-`/<basename>/`-occurrence
        regex keyed the local side at the ancestor, yielding asymmetric
        keys and two rows for one logical file (r9 advisor catch). The
        relkey is now a length-based strip of the resolved root URI."""
        from hebrew_tutor_data_pipeline_spark.sources.readers import local_first_scan

        loc = tmp_path / "books" / "proj" / "books" / "ch1"
        rem = tmp_path / "rem" / "books" / "ch1"
        loc.mkdir(parents=True)
        rem.mkdir(parents=True)
        (loc / "a.mp3").write_bytes(b"L" * 7)
        (rem / "a.mp3").write_bytes(b"R" * 99)
        rows = local_first_scan(
            spark,
            str(tmp_path / "books" / "proj" / "books"),
            str(tmp_path / "rem" / "books"),
        ).collect()
        assert [(r["source"], r["length"]) for r in rows] == [("local", 7)]

    def test_triple_slash_file_uri_root_keeps_depth_identity(self, spark, tmp_path):
        """A root spelled `file:///abs/dir` renders as `file:/abs/dir`
        in the path column; the verbatim-spelling prefix never matched,
        so every row silently fell back to basename-only relkeys and
        same-basename files at different depths collapsed into one
        logical file (ADVICE r10). The root is now re-rendered through
        Hadoop's single-slash spelling: both depths must survive."""
        from hebrew_tutor_data_pipeline_spark.sources.readers import local_first_scan

        loc = tmp_path / "loc"
        rem = tmp_path / "rem"
        (loc / "d1").mkdir(parents=True)
        (loc / "d2").mkdir(parents=True)
        rem.mkdir()
        (loc / "d1" / "a.mp3").write_bytes(b"L" * 3)
        (loc / "d2" / "a.mp3").write_bytes(b"L" * 5)
        rows = local_first_scan(
            spark, "file://" + str(loc), "file:///" + str(rem).lstrip("/")
        ).collect()
        assert sorted(r["length"] for r in rows) == [3, 5]

    def test_authority_full_file_uri_rejected_upfront(self, spark, tmp_path):
        """`file://host/path` (non-empty authority) is not a local-FS
        form this reader supports; it used to silently fold the host
        into the path, which surfaced later as a confusing whole-scan
        raise_error (ADVICE r11). It must now be a ValueError at CALL
        time, while the empty-authority spellings keep working."""
        import pytest as _pytest

        from hebrew_tutor_data_pipeline_spark.sources.readers import local_first_scan

        loc = tmp_path / "loc"
        rem = tmp_path / "rem"
        loc.mkdir()
        rem.mkdir()
        (loc / "a.mp3").write_bytes(b"L" * 3)
        with _pytest.raises(ValueError, match="authority-full"):
            local_first_scan(spark, f"file://somehost{loc}", str(rem))
        with _pytest.raises(ValueError, match="authority-full"):
            local_first_scan(spark, str(loc), f"file://h{rem}")
        # empty-authority and single-slash forms still resolve
        rows = local_first_scan(spark, f"file://{loc}", f"file:{rem}").collect()
        assert [(r["source"], r["length"]) for r in rows] == [("local", 3)]

    def test_missing_everywhere_is_absent(self, spark, tmp_path):
        """The declarative FileNotFoundError: expected-vs-resolved anti join."""
        from hebrew_tutor_data_pipeline_spark.sources.readers import local_first_scan

        loc = tmp_path / "loc" / "b"
        rem = tmp_path / "rem" / "b"
        loc.mkdir(parents=True)
        rem.mkdir(parents=True)
        (loc / "f1.mp3").write_bytes(b"x" * 10)
        resolved = local_first_scan(spark, str(tmp_path / "loc"), str(tmp_path / "rem"))
        expected = spark.createDataFrame(
            [("f1.mp3",), ("f2.mp3",)], ["filename"]
        )
        missing = [
            r["filename"]
            for r in expected.join(resolved, "filename", "left_anti").collect()
        ]
        assert missing == ["f2.mp3"]


class TestBinarySideEffectSinks:
    def make_tree(self, root: Path) -> dict[str, bytes]:
        originals = {}
        for sub, names in [("01_Genesis", ["a.mp3", "b.mp3"]), ("02_Exodus", ["c.mp3"])]:
            d = root / sub
            d.mkdir(parents=True)
            for n in names:
                payload = (sub + n).encode() * 40
                (d / n).write_bytes(payload)
                originals[f"{sub}/{n}"] = payload
        return originals

    def test_overwrite_backup_restore_roundtrip(self, spark, tmp_path):
        from hebrew_tutor_data_pipeline_spark.operators.binary_sink import (
            overwrite_with_backup,
            restore_from_backup,
        )

        root = tmp_path / "audio"
        backup = tmp_path / "backup"
        originals = self.make_tree(root)

        files = read_binary_files(spark, str(root), glob="*.mp3")
        # the "trim": drop the first 16 bytes (hebrew_audio_trimmer.py:180)
        trimmed = files.select("path", F.expr("substring(content, 17)").alias("content"))
        overwrite_with_backup(trimmed, str(backup), str(root))

        for rel, payload in originals.items():
            assert (root / rel).read_bytes() == payload[16:]      # mutated in place
            assert (backup / Path(rel).parent.name / Path(rel).name).read_bytes() == payload

        # second overwrite must NOT clobber the first backup (idempotent)
        files2 = read_binary_files(spark, str(root), glob="*.mp3")
        overwrite_with_backup(
            files2.select("path", F.expr("substring(content, 9)").alias("content")),
            str(backup),
            str(root),
        )
        for rel, payload in originals.items():
            assert (backup / Path(rel).parent.name / Path(rel).name).read_bytes() == payload

        n = restore_from_backup(spark, str(backup), str(root))
        assert n == len(originals)
        for rel, payload in originals.items():
            assert (root / rel).read_bytes() == payload           # fully restored

    def test_upload_blobs_fake_container(self, spark, tmp_path):
        import pytest

        from hebrew_tutor_data_pipeline_spark.operators.binary_sink import upload_blobs

        root = tmp_path / "audio"
        container = tmp_path / "container"
        originals = self.make_tree(root)

        files = read_binary_files(spark, str(root), glob="*.mp3")
        upload_blobs(files, container_dir=str(container))
        for rel, payload in originals.items():
            assert (container / "audio" / Path(rel).name).read_bytes() == payload

        # overwrite=True semantics: re-upload replaces
        upload_blobs(
            files.select("path", F.expr("substring(content, 1, 4)").alias("content")),
            container_dir=str(container),
        )
        for rel, payload in originals.items():
            assert (container / "audio" / Path(rel).name).read_bytes() == payload[:4]

        with pytest.raises(NotImplementedError):
            upload_blobs(files, fake=False)

    def test_with_content_serves_winning_bytes(self, spark, tmp_path):
        from hebrew_tutor_data_pipeline_spark.sources.readers import local_first_scan

        loc = tmp_path / "loc" / "b"
        rem = tmp_path / "rem" / "b"
        loc.mkdir(parents=True)
        rem.mkdir(parents=True)
        (loc / "f.mp3").write_bytes(b"LOCAL")
        (rem / "f.mp3").write_bytes(b"REMOTE-BYTES")
        (rem / "g.mp3").write_bytes(b"ONLY-REMOTE")
        got = {
            r["filename"]: bytes(r["content"])
            for r in local_first_scan(
                spark, str(tmp_path / "loc"), str(tmp_path / "rem"), with_content=True
            ).collect()
        }
        assert got == {"f.mp3": b"LOCAL", "g.mp3": b"ONLY-REMOTE"}


class TestBucketedTables:
    """Bucketing = pay the join shuffle once at write time: a join of two
    tables bucketed on the same key must plan with ZERO Exchange and
    return exactly the shuffled join's rows."""

    def test_bucketed_join_is_exchange_free_and_correct(self, spark, tmp_path):
        import io
        from contextlib import redirect_stdout

        from hebrew_tutor_data_pipeline_spark.sources.bucketed import (
            bucket_spec,
            write_bucketed,
        )
        from hebrew_tutor_data_pipeline_spark.sources.readers import load_table

        sf = "/root/testdata/sf0.001"
        orders = load_table(spark, sf, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
        customer = load_table(spark, sf, "customer").select("c_custkey", "c_name")

        write_bucketed(
            orders, "b_orders", "o_custkey", 8, sort_cols="o_custkey",
            path=str(tmp_path / "b_orders"),
        )
        write_bucketed(
            customer.withColumnRenamed("c_custkey", "o_custkey"),
            "b_customer", "o_custkey", 8, sort_cols="o_custkey",
            path=str(tmp_path / "b_customer"),
        )
        assert bucket_spec(spark, "b_orders") == (8, ["o_custkey"])
        assert bucket_spec(spark, "b_customer") == (8, ["o_custkey"])

        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = spark.table("b_orders").join(spark.table("b_customer"), "o_custkey")
            joined.collect()  # finalize AQE so the audited plan is the real one
            buf = io.StringIO()
            with redirect_stdout(buf):
                joined.explain("formatted")
            plan = buf.getvalue()
            assert "Exchange" not in plan, plan
            assert "SortMergeJoin" in plan, plan

            expect = (
                orders.join(
                    customer.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey"
                )
                .orderBy("o_orderkey")
                .collect()
            )
            got = joined.orderBy("o_orderkey").collect()
            assert [r.asDict() for r in got] == [r.asDict() for r in expect]
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
            spark.sql("DROP TABLE IF EXISTS b_orders")
            spark.sql("DROP TABLE IF EXISTS b_customer")

    def test_bucketed_groupby_is_exchange_free(self, spark, tmp_path):
        import io
        from contextlib import redirect_stdout

        from pyspark.sql import functions as F

        from hebrew_tutor_data_pipeline_spark.sources.bucketed import write_bucketed
        from hebrew_tutor_data_pipeline_spark.sources.readers import load_table

        sf = "/root/testdata/sf0.001"
        li = load_table(spark, sf, "lineitem").select("l_orderkey", "l_quantity")
        write_bucketed(li, "b_li", "l_orderkey", 8, path=str(tmp_path / "b_li"))
        try:
            agg = spark.table("b_li").groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
            agg.collect()
            buf = io.StringIO()
            with redirect_stdout(buf):
                agg.explain("formatted")
            plan = buf.getvalue()
            assert "Exchange" not in plan, plan
        finally:
            spark.sql("DROP TABLE IF EXISTS b_li")


class TestDataLayout:
    def test_partitioned_write_prunes_partitions(self, spark, tmp_path):
        """A date predicate over a hive-partitioned tree must become a
        PartitionFilter — untouched dates are never scanned."""
        import io
        from contextlib import redirect_stdout

        from pyspark.sql import functions as F

        from hebrew_tutor_data_pipeline_spark.sources.layout import (
            write_partitioned_sorted,
        )
        from hebrew_tutor_data_pipeline_spark.sources.readers import load_table

        e = load_table(spark, "/root/testdata/sf0.001", "events").withColumn(
            "day", F.to_date("ts")
        )
        out = str(tmp_path / "by_day")
        write_partitioned_sorted(e, out, partition_cols="day", sort_cols="user_id")

        n_days = e.select("day").distinct().count()
        assert n_days > 1
        one_day = e.select(F.max(F.to_date("ts"))).first()[0]
        scan = spark.read.parquet(out).filter(F.col("day") == F.lit(one_day))
        buf = io.StringIO()
        with redirect_stdout(buf):
            scan.explain("formatted")
        plan = buf.getvalue()
        # the day equality must appear as a PartitionFilter (directory
        # pruning), NOT a data filter evaluated per row
        pf_lines = [l for l in plan.splitlines() if "PartitionFilters" in l]
        assert pf_lines and any("day" in l for l in pf_lines), plan
        assert scan.count() == e.filter(F.col("day") == F.lit(one_day)).count()

    def test_compact_reduces_file_count_preserving_rows(self, spark, tmp_path):
        from hebrew_tutor_data_pipeline_spark.sources.layout import compact
        from hebrew_tutor_data_pipeline_spark.sources.readers import load_table

        e = load_table(spark, "/root/testdata/sf0.001", "events")
        src = str(tmp_path / "tiny")
        e.repartition(40).write.parquet(src)  # the small-file mess
        assert len(spark.read.parquet(src).inputFiles()) == 40

        dst = str(tmp_path / "compacted")
        n_out = compact(spark, src, dst, target_mb=128)
        assert n_out == 1  # ~200 KB of data fits one 128 MB target file
        got = spark.read.parquet(dst)
        assert got.count() == e.count()
        assert sorted(got.columns) == sorted(e.columns)


class TestQuarantineIngest:
    def test_corrupt_rows_quarantined_not_dropped(self, spark, tmp_path):
        import json

        from pyspark.sql import functions as F

        from hebrew_tutor_data_pipeline_spark.sources.readers import (
            read_json_with_quarantine,
        )

        p = tmp_path / "in.json"
        good = [{"event_id": i, "event_type": "click"} for i in range(5)]
        with open(p, "w") as f:
            for rec in good[:3]:
                f.write(json.dumps(rec) + "\n")
            f.write('{"event_id": 99, "event_type": "click"   // no close\n')
            f.write("TOTAL GARBAGE LINE\n")
            for rec in good[3:]:
                f.write(json.dumps(rec) + "\n")

        df = read_json_with_quarantine(
            spark, str(p), "event_id long, event_type string"
        )
        ok = df.filter(F.col("_corrupt_record").isNull())
        # NB: must reference a data column alongside the corrupt column
        # (Spark rejects corrupt-column-only queries on raw JSON)
        bad = df.filter(F.col("_corrupt_record").isNotNull()).select(
            "event_id", "_corrupt_record"
        )
        assert sorted(r["event_id"] for r in ok.collect()) == [0, 1, 2, 3, 4]
        bad_rows = bad.collect()
        assert len(bad_rows) == 2  # both bad lines kept, raw text intact
        assert "TOTAL GARBAGE LINE" in {r["_corrupt_record"] for r in bad_rows}


class TestConformSchema:
    def test_missing_extra_and_cast(self, spark):
        from hebrew_tutor_data_pipeline_spark.sources.readers import conform_schema

        df = spark.createDataFrame(
            [(1, "x", "junk")], "a int, b string, zz string"
        )
        out = conform_schema(df, "a bigint, b string, c double")
        assert out.columns == ["a", "b", "c"]
        row = out.first()
        assert row["a"] == 1 and isinstance(row["a"], int)
        assert row["c"] is None
        assert dict(out.dtypes)["a"] == "bigint"
        assert dict(out.dtypes)["c"] == "double"

    def test_extra_error_mode(self, spark):
        import pytest as _pytest

        from hebrew_tutor_data_pipeline_spark.sources.readers import conform_schema

        df = spark.createDataFrame([(1, "y")], "a int, zz string")
        with _pytest.raises(ValueError, match="zz"):
            conform_schema(df, "a bigint", on_extra="error")

    def test_column_order_follows_target(self, spark):
        from hebrew_tutor_data_pipeline_spark.sources.readers import conform_schema

        df = spark.createDataFrame([("t", 5)], "b string, a int")
        out = conform_schema(df, "a bigint, b string")
        assert out.columns == ["a", "b"]
        assert tuple(out.first()) == (5, "t")

    def test_identity_and_idempotence(self, spark):
        from hebrew_tutor_data_pipeline_spark.sources.readers import (
            conform_schema,
            load_table,
        )

        d = load_table(spark, "/root/testdata/sf0.001", "documents")
        ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in d.schema.fields)
        once = conform_schema(d, ddl)
        twice = conform_schema(once, ddl)
        assert once.schema == d.schema == twice.schema
        assert sorted(map(tuple, once.collect())) == sorted(map(tuple, d.collect()))
        assert sorted(map(tuple, twice.collect())) == sorted(map(tuple, d.collect()))

    def test_case_insensitive_match_and_dotted_names(self, spark):
        from hebrew_tutor_data_pipeline_spark.sources.readers import conform_schema

        df = spark.createDataFrame([(7, "u")], ["Doc_ID", "`meta.url`"])
        df = df.toDF("Doc_ID", "meta.url")
        out = conform_schema(df, "doc_id bigint, b string")
        assert out.columns == ["doc_id", "b"]
        assert tuple(out.first()) == (7, None)
        # dotted extra column must not be parsed as a struct path
        out2 = conform_schema(df, "doc_id bigint")
        assert tuple(out2.first()) == (7,)

    def test_case_collision_is_ambiguous(self, spark):
        import pytest as _pytest

        from hebrew_tutor_data_pipeline_spark.sources.readers import conform_schema

        # Two source columns differing only by case both match the target
        # field: dict last-wins would pick one arbitrarily and drop the
        # other unreported — must raise, mirroring Spark's own
        # ambiguous-reference error.
        df = spark.createDataFrame([(1, 2)], ["doc_id", "DOC_ID"])
        with _pytest.raises(ValueError, match="ambiguous"):
            conform_schema(df, "doc_id bigint")
        # ...even in on_extra='error' mode (previously the loser was
        # neither selected nor reported as an extra)
        with _pytest.raises(ValueError, match="ambiguous"):
            conform_schema(df, "doc_id bigint", on_extra="error")
        # colliding columns that are BOTH extras stay an extras problem
        df2 = spark.createDataFrame([(1, 2, 3)], ["a", "Zz", "ZZ"])
        out = conform_schema(df2, "a bigint")  # drop mode: fine
        assert out.columns == ["a"]
        with _pytest.raises(ValueError, match="Zz"):
            conform_schema(df2, "a bigint", on_extra="error")

    def test_on_extra_validation(self, spark):
        import pytest as _pytest

        from hebrew_tutor_data_pipeline_spark.sources.readers import conform_schema

        df = spark.createDataFrame([(1,)], ["a"])
        with _pytest.raises(ValueError, match="on_extra"):
            conform_schema(df, "a bigint", on_extra="raise")


class TestPythonDataSource:
    """Spark 4 Python DataSource connector (sources/pyds.py)."""

    ROOT = "tests/fixtures/audio_tree"

    def test_read_equals_probe_replay(self, spark):
        import os

        from hebrew_tutor_data_pipeline_spark.sources.pyds import (
            _scan_book,
            register_chapter_source,
        )

        register_chapter_source(spark)
        root = os.path.abspath(self.ROOT)
        got = sorted(
            map(
                tuple,
                spark.read.format("hebrew_chapters")
                .option("root", root)
                .option("max_chapter", 4)
                .load()
                .collect(),
            )
        )
        want = sorted(
            row
            for d in os.listdir(root)
            if os.path.isdir(os.path.join(root, d))
            for row in _scan_book(root, d, 4)
        )
        assert got == want and len(got) == 12
        # existence probing is real: chapter 4 exists for no book
        assert all(not ex for (_, _, _, ch, _, ex, _) in got if ch == 4)

    def test_partitioning_is_per_book(self, spark):
        import os

        from hebrew_tutor_data_pipeline_spark.sources.pyds import (
            ChapterAudioReader,
        )

        r = ChapterAudioReader({"root": os.path.abspath(self.ROOT)})
        parts = r.partitions()
        assert sorted(p.dirname for p in parts) == [
            "01_Genesis", "02_Exodus", "18_Obadiah",
        ]

    def test_missing_root_raises(self):
        import pytest as _pytest

        from hebrew_tutor_data_pipeline_spark.sources.pyds import (
            ChapterAudioReader,
        )

        with _pytest.raises(ValueError, match="root"):
            ChapterAudioReader({})

    def test_pushdown_prunes_partitions(self, spark):
        import os

        from pyspark.sql.datasource import EqualTo, GreaterThan
        from hebrew_tutor_data_pipeline_spark.sources.pyds import (
            ChapterAudioReader,
            register_chapter_source,
        )

        root = os.path.abspath(self.ROOT)
        r = ChapterAudioReader({"root": root})
        remaining = list(
            r.pushFilters([EqualTo(("book_num",), 18), GreaterThan(("size",), 0)])
        )
        # book equality consumed (fully satisfied by pruning); the size
        # predicate stays with Spark
        assert [type(f).__name__ for f in remaining] == ["GreaterThan"]
        assert [p.dirname for p in r.partitions()] == ["18_Obadiah"]
        # end-to-end: the filtered scan returns only Obadiah rows, and a
        # fully-pruned scan yields an empty frame (read(None) path)
        register_chapter_source(spark)
        base = (
            spark.read.format("hebrew_chapters")
            .option("root", root)
            .option("max_chapter", 4)
            .load()
        )
        assert base.filter("book_num = 18").count() == 4
        assert base.filter("book_num = 99").count() == 0
        assert base.filter("book = 'Exodus'").count() == 4

    def test_stream_reader_offsets_and_pacing(self):
        import os

        from hebrew_tutor_data_pipeline_spark.sources.pyds import (
            ChapterAudioStreamReader,
        )

        root = os.path.abspath(self.ROOT)
        r = ChapterAudioStreamReader({"root": root, "books_per_batch": 1})
        assert r.initialOffset() == {"i": 0}
        # paced: one book per trigger, then parked at the end
        assert [r.latestOffset()["i"] for _ in range(5)] == [1, 2, 3, 3, 3]
        parts = r.partitions({"i": 1}, {"i": 3})
        assert [p.dirname for p in parts] == ["02_Exodus", "18_Obadiah"]
        assert r.partitions({"i": 3}, {"i": 3}) == []
        # unpaced (the availableNow snapshot): everything in one offset
        r2 = ChapterAudioStreamReader({"root": root})
        assert r2.latestOffset() == {"i": 3}
        rows = list(r2.read(r2.partitions({"i": 0}, {"i": 3})[0]))
        assert rows and all(len(t) == 7 for t in rows)

    def test_stream_reader_offset_monotone_after_restart(self):
        """After a checkpoint restart the reader is a FRESH object whose
        cursor starts at 0 while Spark's committed offset may be ahead;
        the committed position (revealed via partitions()/commit()) must
        ratchet the cursor so latestOffset never regresses below it —
        the offset contract forbids end < start."""
        import os

        from hebrew_tutor_data_pipeline_spark.sources.pyds import (
            ChapterAudioStreamReader,
        )

        root = os.path.abspath(self.ROOT)
        # restart replaying a committed batch: partitions() reveals i=2
        r = ChapterAudioStreamReader({"root": root, "books_per_batch": 1})
        r.partitions({"i": 2}, {"i": 2})
        assert r.latestOffset()["i"] == 3  # 2+1, not 0+1
        # restart where only commit() fires before the next trigger
        r2 = ChapterAudioStreamReader({"root": root, "books_per_batch": 1})
        r2.commit({"i": 2})
        assert r2.latestOffset()["i"] == 3

    def test_restart_protocol_replay(self):
        """Replays Spark 4.1's MEASURED restart call sequences (traced via
        HTDP_PYDS_TRACE in the e2e test below; the first call on a fresh
        reader is always partitions(loggedEnd, loggedEnd), never
        latestOffset). The reader must (a) answer the probe with an empty
        slice, (b) honor an uncommitted-batch replay VERBATIM — clamping
        the slice by any previously seen start would LOSE the replayed
        data — and (c) have its cursor ratcheted past the checkpoint so
        latestOffset never regresses."""
        import os

        from hebrew_tutor_data_pipeline_spark.sources.pyds import (
            ChapterAudioStreamReader,
        )

        root = os.path.abspath(self.ROOT)
        # clean restart, all 3 books committed: probe then park
        r = ChapterAudioStreamReader({"root": root, "books_per_batch": 1})
        assert r.partitions({"i": 3}, {"i": 3}) == []
        assert r.latestOffset() == {"i": 3}  # ratcheted: 3, not 0+1
        # restart with batch (1,2) logged but uncommitted: probe at the
        # logged end, then the replay — which must yield book index 1
        r2 = ChapterAudioStreamReader({"root": root, "books_per_batch": 1})
        assert r2.partitions({"i": 2}, {"i": 2}) == []
        parts = r2.partitions({"i": 1}, {"i": 2})
        assert [p.dirname for p in parts] == ["02_Exodus"]  # replay intact
        assert r2.latestOffset() == {"i": 3}

    def test_stream_scan_equals_batch_scan(self, spark):
        """End-to-end paced stream (processing-time micro-batches, one
        book each) commits exactly the batch scan's rows across ≥3
        batches — incremental ingest is real, not one big batch."""
        import os
        import shutil
        import tempfile
        import time

        from hebrew_tutor_data_pipeline_spark.sources.pyds import (
            register_chapter_source,
        )

        register_chapter_source(spark)
        root = os.path.abspath(self.ROOT)
        scratch = tempfile.mkdtemp(prefix="htdp_pyds_stream_test_")
        out, ckpt = f"{scratch}/out", f"{scratch}/ckpt"
        seen_batches = []

        def _sink(batch_df, batch_id):
            if batch_df.count() > 0:
                batch_df.write.mode("overwrite").parquet(f"{out}/batch_id={batch_id}")
                # append AFTER the write commits: the stop() below fires
                # once 3 batches are seen, and must never interrupt an
                # in-flight write (torn parquet ⇒ read-back mismatch)
                seen_batches.append(batch_id)

        stream = (
            spark.readStream.format("hebrew_chapters")
            .option("root", root)
            .option("max_chapter", 4)
            .option("books_per_batch", 1)
            .load()
        )
        q = (
            stream.writeStream.outputMode("append")
            .foreachBatch(_sink)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="0 seconds")
            .start()
        )
        try:
            deadline = time.time() + 120
            while time.time() < deadline and len(seen_batches) < 3:
                time.sleep(0.5)
        finally:
            q.stop()
        assert len(seen_batches) >= 3  # one micro-batch per book
        got = sorted(map(tuple, spark.read.parquet(out).drop("batch_id").collect()))
        want = sorted(
            map(
                tuple,
                spark.read.format("hebrew_chapters")
                .option("root", root)
                .option("max_chapter", 4)
                .load()
                .collect(),
            )
        )
        assert got == want and len(got) == 12
        shutil.rmtree(scratch, ignore_errors=True)

    def test_checkpoint_restart_exactly_once(self, spark):
        """REAL checkpoint restart (not the protocol-level replay): run
        the paced stream until ≥1 batch commits, stop, start a SECOND
        query on the same checkpoint — a fresh reader whose first
        latestOffset() cannot know the committed offset. The union of
        both runs' sinks must hold each chapter row exactly once: no
        re-emission of the committed prefix, no gap."""
        import os
        import shutil
        import tempfile
        import time

        from hebrew_tutor_data_pipeline_spark.sources.pyds import (
            register_chapter_source,
        )

        register_chapter_source(spark)
        root = os.path.abspath(self.ROOT)
        scratch = tempfile.mkdtemp(prefix="htdp_pyds_restart_test_")
        out, ckpt = f"{scratch}/out", f"{scratch}/ckpt"
        committed = []

        def _sink(batch_df, batch_id):
            rows = batch_df.count()
            if rows > 0:
                # keyed by batch_id ALONE: a batch replayed after restart
                # (stopped between sink write and checkpoint commit) must
                # OVERWRITE its own output — the foreachBatch idempotence
                # contract every catalog stream sink follows
                batch_df.write.mode("overwrite").parquet(
                    f"{out}/batch_id={batch_id}"
                )
            committed.append(rows)  # count committed batches incl. empty

        def _run(min_nonempty: int):
            del committed[:]
            stream = (
                spark.readStream.format("hebrew_chapters")
                .option("root", root)
                .option("max_chapter", 4)
                .option("books_per_batch", 1)
                .load()
            )
            q = (
                stream.writeStream.outputMode("append")
                .foreachBatch(_sink)
                .option("checkpointLocation", ckpt)
                .trigger(processingTime="0 seconds")
                .start()
            )
            try:
                deadline = time.time() + 120
                while (
                    time.time() < deadline
                    and sum(1 for n in committed if n > 0) < min_nonempty
                ):
                    time.sleep(0.5)
            finally:
                q.stop()
                q.awaitTermination(60)

        _run(min_nonempty=1)  # first run: commit at least one book
        n1 = sum(1 for n in committed if n > 0)
        # restart on the same checkpoint: drain the remaining books
        # (the fixture has 3 → 3 nonempty batches total across both runs)
        _run(min_nonempty=max(0, 3 - n1))
        got = sorted(
            map(tuple, spark.read.parquet(out).drop("batch_id").collect())
        )
        want = sorted(
            map(
                tuple,
                spark.read.format("hebrew_chapters")
                .option("root", root)
                .option("max_chapter", 4)
                .load()
                .collect(),
            )
        )
        assert got == want and len(got) == 12  # exactly once, no dupes/gaps
        shutil.rmtree(scratch, ignore_errors=True)

    def test_alignment_json_sink_two_phase_commit(self, spark):
        import json
        import os
        import shutil
        import tempfile

        from pyspark.sql import Row

        from hebrew_tutor_data_pipeline_spark.sources.pyds import (
            AlignmentJsonWriter,
            register_chapter_source,
        )

        dest = tempfile.mkdtemp(prefix="htdp_pyds_sink_test_")
        rows = [
            Row(book="Gen", chapter=1, verse_num=2, text="שני"),
            Row(book="Gen", chapter=1, verse_num=1, text="ראשון"),
            Row(book="Obad", chapter=1, verse_num=1, text="חזון"),
        ]

        # staged output is invisible before commit; abort leaves the
        # destination untouched
        w = AlignmentJsonWriter({"path": dest}, overwrite=True)
        msg = w.write(iter(rows))
        assert sorted(msg.files) == ["Gen_001.json", "Obad_001.json"]
        assert not [f for f in os.listdir(dest) if f.endswith(".json")]
        w.abort([msg])
        assert os.listdir(dest) == []

        # commit: stale file cleared (overwrite), verses verse-sorted,
        # UTF-8 not ascii-escaped, losing speculative twin swept unseen
        with open(os.path.join(dest, "Zzz_009.json"), "w") as f:
            f.write("{}")
        winner = w.write(iter(rows))
        loser = w.write(iter(rows))  # speculative duplicate, never committed
        w.commit([winner, None])
        names = sorted(os.listdir(dest))
        assert names == ["Gen_001.json", "Obad_001.json", "_SUCCESS"]
        raw = open(os.path.join(dest, "Gen_001.json"), "rb").read()
        assert "ראשון".encode() in raw  # ensure_ascii=False
        doc = json.loads(raw)
        assert [v["verse"] for v in doc["verses"]] == [1, 2]
        assert not os.path.exists(loser.staging_dir)

        # end-to-end through the DataFrame writer API
        register_chapter_source(spark)
        (
            spark.createDataFrame(rows)
            .repartition("book", "chapter")
            .write.format("hebrew_alignment_json")
            .mode("overwrite")
            .option("path", dest)
            .save()
        )
        assert sorted(os.listdir(dest)) == ["Gen_001.json", "Obad_001.json", "_SUCCESS"]
        shutil.rmtree(dest, ignore_errors=True)
