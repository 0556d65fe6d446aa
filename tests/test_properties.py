"""Property-based tests (hypothesis) for the engine's algebraic
invariants — a layer the reference's script-and-log test strategy
(SURVEY.md §5) never had. Each property is checked against many
generated inputs through the REAL Spark operators, not Python mirrors.

Spark-session round trips are ~100 ms each, so examples are capped low;
the value is the generator's edge cases (empty strings, single tokens,
equal weights, duplicate keys), not volume.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from hebrew_tutor_data_pipeline_spark.functions.text import whitespace_tokens
from hebrew_tutor_data_pipeline_spark.operators.alignment import allocate_proportional
from hebrew_tutor_data_pipeline_spark.operators.dedup import (
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
)

SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

texts = st.text(
    alphabet=st.sampled_from("ab עשה "),  # tiny alphabet → frequent collisions
    min_size=0,
    max_size=40,
)


class TestAllocationProperties:
    @SLOW
    @given(
        weights=st.lists(st.integers(min_value=1, max_value=50), min_size=1, max_size=12),
        total=st.floats(min_value=1.0, max_value=10_000.0, allow_nan=False),
    )
    def test_allocation_covers_total_and_is_monotone(self, spark, weights, total):
        """Σ durations == total (±rounding); starts strictly ordered and
        each row's end == next row's start up to 2-dp rounding error."""
        rows = [("g", i, w, float(total)) for i, w in enumerate(weights)]
        df = spark.createDataFrame(rows, ["grp", "pos", "w", "total"])
        out = (
            allocate_proportional(df, ["grp"], "pos", "w", "total")
            .orderBy("pos")
            .collect()
        )
        # rounding each of n starts/ends to 2 dp bounds drift by n cents
        tol = 0.01 * (len(weights) + 1)
        assert abs(out[-1]["end"] - total) <= tol
        assert out[0]["start"] == 0.0
        for a, b in zip(out, out[1:]):
            assert a["start"] <= b["start"]
            assert abs(a["end"] - b["start"]) <= tol

    @SLOW
    @given(
        weights=st.lists(st.integers(min_value=1, max_value=9), min_size=2, max_size=6)
    )
    def test_allocation_proportionality(self, spark, weights):
        """Durations are proportional to weights: dur_i / dur_j ≈ w_i / w_j."""
        total = 1000.0
        rows = [("g", i, w, total) for i, w in enumerate(weights)]
        df = spark.createDataFrame(rows, ["grp", "pos", "w", "total"])
        out = allocate_proportional(df, ["grp"], "pos", "w", "total").orderBy("pos").collect()
        s = sum(weights)
        for r, w in zip(out, weights):
            assert math.isclose(r["end"] - r["start"], w / s * total, abs_tol=0.03)


class TestDedupProperties:
    @SLOW
    @given(doc=texts)
    def test_minhash_signature_entries_are_true_minima(self, spark, doc):
        """Every signature entry is ≤ MOD and the signature is identical
        when the same document appears under two ids (permutation
        invariance of the per-row computation)."""
        df = spark.createDataFrame([(1, doc), (2, doc)], ["id", "text"])
        rows = minhash_signatures(df, "id", "text", n=2, num_hashes=8).collect()
        sigs = {r["id"]: list(r["sig"]) for r in rows}
        assert sigs[1] == sigs[2]
        assert all(len(s) == 8 for s in sigs.values())

    @SLOW
    @given(a=texts, b=texts)
    def test_jaccard_pairs_bounds_and_identity(self, spark, a, b):
        """0 ≤ jaccard ≤ 1 for any pair; identical non-empty docs score
        exactly 1.0 (n=1 token shingles)."""
        df = spark.createDataFrame([(1, a), (2, b), (3, a)], ["id", "text"])
        pairs = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in ngram_jaccard_pairs(df, "id", "text", n=1, threshold=0.0).collect()
        }
        for v in pairs.values():
            assert 0.0 <= v <= 1.0
        if a.split():  # doc 1 and 3 identical and non-empty
            assert pairs.get((1, 3)) == 1.0

    @SLOW
    @given(doc=texts)
    def test_simhash_stable_and_bounded(self, spark, doc):
        """Fingerprint fits in `bits` bits and is deterministic."""
        df = spark.createDataFrame([(1, doc)], ["id", "text"])
        h1 = simhash(df, "id", "text", bits=16).first()["simhash"]
        h2 = simhash(df, "id", "text", bits=16).first()["simhash"]
        assert h1 == h2
        assert 0 <= h1 < 2**16


class TestTokenizerProperties:
    @SLOW
    @given(doc=texts)
    def test_whitespace_tokens_match_python_split(self, spark, doc):
        """The engine's tokenizer agrees with str.split() — the oracle
        SQL's string_split_regex twin relies on this equivalence."""
        df = spark.createDataFrame([(doc,)], ["text"])
        got = df.select(whitespace_tokens(F.col("text")).alias("t")).first()["t"]
        assert got == doc.split()


class TestBandedSearchProperties:
    @SLOW
    @given(
        docs=st.lists(texts, min_size=2, max_size=10),
        max_d=st.integers(min_value=0, max_value=3),
    )
    def test_simhash_banding_is_exhaustive(self, spark, docs, max_d):
        """With max_distance < bands the banded plan must equal brute
        force exactly — the pigeonhole claim, property-checked."""
        from hebrew_tutor_data_pipeline_spark.operators.dedup import (
            simhash_near_dup_pairs,
        )

        rows = [(i, t) for i, t in enumerate(docs)]
        df = spark.createDataFrame(rows, ["id", "text"])
        banded = {
            (r["id_a"], r["id_b"], r["hamming"])
            for r in simhash_near_dup_pairs(
                df, "id", "text", bits=16, bands=4, max_distance=max_d
            ).collect()
        }
        fps = {r["id"]: r["simhash"] for r in simhash(df, "id", "text", bits=16).collect()}
        brute = {
            (a, b, bin(fps[a] ^ fps[b]).count("1"))
            for a in fps
            for b in fps
            if a < b and bin(fps[a] ^ fps[b]).count("1") <= max_d
        }
        assert banded == brute


class TestTranscribeProperties:
    @SLOW
    @given(
        n_words=st.integers(min_value=0, max_value=40),
        duration_s=st.integers(min_value=1, max_value=120),
        drop_every=st.sampled_from([0, 2, 7]),
    )
    def test_transcribe_timing_invariants(self, spark, n_words, duration_s, drop_every):
        """Chunk bounds always lie inside the audio; chunk indices are
        non-decreasing in word order; dropped indices are exactly the
        drop_every-th ones."""
        from hebrew_tutor_data_pipeline_spark.operators import transcribe

        text = " ".join(f"w{i}" for i in range(n_words))
        df = spark.createDataFrame(
            [("b", 1, text, duration_s * 1000)],
            "book string, chapter int, text string, duration_ms long",
        )
        out = sorted(
            transcribe.transcribe_words(
                df, ["book", "chapter"], drop_every=drop_every
            ).collect(),
            key=lambda r: r.word_idx,
        )
        if n_words == 0:
            assert out == []
            return
        expected_idx = [
            i
            for i in range(n_words)
            if not (drop_every and i % drop_every == drop_every - 1)
        ]
        assert [r.word_idx for r in out] == expected_idx
        prev_chunk = -1
        for r in out:
            assert 0 <= r.start_ms <= r.end_ms <= duration_s * 1000
            assert r.chunk_idx >= prev_chunk
            prev_chunk = r.chunk_idx
            assert 0.5 <= r.confidence <= 0.99


class TestSkewProperties:
    @SLOW
    @given(
        rows=st.lists(
            st.tuples(
                st.sampled_from(["k1", "k2", "hot"]),  # skewed key space
                st.integers(min_value=-100, max_value=100),
            ),
            min_size=1,
            max_size=30,
        ),
        n_salts=st.integers(min_value=1, max_value=9),
    )
    def test_salted_aggregate_invisible_vs_direct(self, spark, rows, n_salts):
        """For ANY data and salt count, two-phase salted aggregation must
        equal the direct groupBy — sums, extremes, averages, and set
        membership alike."""
        from hebrew_tutor_data_pipeline_spark.operators.skew import salted_aggregate

        df = spark.createDataFrame(rows, ["k", "v"])
        direct = {
            r["k"]: (r["s"], r["mn"], r["mx"], r["avg"], tuple(sorted(r["vs"])))
            for r in df.groupBy("k")
            .agg(
                F.sum("v").alias("s"),
                F.min("v").alias("mn"),
                F.max("v").alias("mx"),
                F.avg("v").alias("avg"),
                F.collect_set("v").alias("vs"),
            )
            .collect()
        }
        salted = {
            r["k"]: (r["s"], r["mn"], r["mx"], r["avg"], tuple(sorted(r["vs"])))
            for r in salted_aggregate(
                df,
                ["k"],
                {
                    "s": ("v", "sum"),
                    "mn": ("v", "min"),
                    "mx": ("v", "max"),
                    "avg": ("v", "avg"),
                    "vs": ("v", "collect_set"),
                },
                n_salts=n_salts,
            ).collect()
        }
        assert set(direct) == set(salted)
        for k in direct:
            ds, dmn, dmx, davg, dvs = direct[k]
            ss, smn, smx, savg, svs = salted[k]
            assert (ds, dmn, dmx, dvs) == (ss, smn, smx, svs)
            assert math.isclose(davg, savg, rel_tol=1e-12, abs_tol=1e-12)


class TestIntervalJoinProperties:
    @SLOW
    @given(
        points=st.lists(
            st.floats(min_value=0.0, max_value=50.0, allow_nan=False), min_size=1, max_size=15
        ),
        intervals=st.lists(
            st.tuples(
                st.floats(min_value=0.0, max_value=50.0, allow_nan=False),
                st.floats(min_value=0.0, max_value=10.0, allow_nan=False),
            ),
            min_size=1,
            max_size=10,
        ),
        bin_width=st.sampled_from([0.7, 1.0, 3.0, 25.0]),
    )
    def test_binned_equals_naive(self, spark, points, intervals, bin_width):
        """For ANY points, intervals, and bin width, the binned rewrite
        must return exactly the pairs of the naive range predicate —
        each exactly once (a point owns one bin)."""
        from hebrew_tutor_data_pipeline_spark.operators.intervals import (
            point_in_interval_join,
        )

        p = spark.createDataFrame(
            [(i, float(x)) for i, x in enumerate(points)], ["pid", "x"]
        )
        iv = spark.createDataFrame(
            [(j, float(s), float(s + w)) for j, (s, w) in enumerate(intervals)],
            ["iid", "s", "e"],
        )
        got = sorted(
            (r["pid"], r["iid"])
            for r in point_in_interval_join(p, iv, "x", "s", "e", bin_width=bin_width)
            .select("pid", "iid")
            .collect()
        )
        want = sorted(
            (i, j)
            for i, x in enumerate(points)
            for j, (s, w) in enumerate(intervals)
            if s <= x <= s + w
        )
        assert got == want


def _py_kgram_keys(tokens: list[str], k: int) -> list[int]:
    """Pure-Python reference of the engine's 62-bit combined k-gram key:
    two independent polynomial chains packed as g1*MOD2 + g2 (mirrors
    operators.dedup._kgram_hash)."""
    M1, B1 = 2_147_483_647, 31
    M2, B2 = 2_147_483_629, 131

    def th(tok: str, base: int, mod: int) -> int:
        h = 0
        for c in tok:
            h = (h * base + ord(c)) % mod
        return h

    h1 = [th(t, B1, M1) for t in tokens]
    h2 = [th(t, B2, M2) for t in tokens]
    kg = []
    for i in range(len(tokens) - k + 1):
        g1 = g2 = 0
        for j in range(k):
            # bases CROSSED vs the token hashes (see _kgram_hash)
            g1 = (g1 * B2 + h1[i + j]) % M1
            g2 = (g2 * B1 + h2[i + j]) % M2
        kg.append(g1 * M2 + g2)
    return kg


def _py_winnow(tokens: list[str], k: int, w: int) -> set[tuple[int, int]]:
    """Pure-Python reference winnowing (Schleimer et al. 2003) with the
    engine's combined k-gram keys and rightmost tie-break."""
    kg = _py_kgram_keys(tokens, k)
    if not kg:
        return set()
    out = set()
    for s in range(max(len(kg) - w, 0) + 1):
        window = kg[s : s + w]
        m = min(window)
        # rightmost occurrence of the minimum
        pos = s + max(j for j, v in enumerate(window) if v == m)
        out.add((pos, kg[pos]))
    return out


class TestWinnowingProperties:
    @given(
        docs=st.lists(
            st.lists(
                st.sampled_from(["aa", "ab", "ba", "עשה", "x"]),
                min_size=0,
                max_size=20,
            ),
            min_size=1,
            max_size=4,
        )
    )
    @SLOW
    def test_matches_python_reference(self, spark, docs):
        """The Spark winnowing operator equals the straightforward
        Python implementation on arbitrary token lists — positions,
        hashes, and short-doc edge cases included."""
        from hebrew_tutor_data_pipeline_spark.operators.dedup import (
            winnow_fingerprints,
        )

        rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        got: dict = {}
        for r in winnow_fingerprints(df, "doc_id", "text", k=3, w=4).collect():
            got.setdefault(r["id"], set()).add((r["fp_pos"], r["fingerprint"]))
        for i, toks in enumerate(docs):
            # whitespace_tokens semantics: split on runs, empty -> []
            toks_eff = " ".join(toks).split()
            expected = _py_winnow(toks_eff, 3, 4)
            assert got.get(i, set()) == expected, (i, toks_eff)


class TestAsofProperties:
    @given(
        left=st.lists(
            st.tuples(st.integers(0, 2), st.integers(0, 50)), min_size=1, max_size=15
        ),
        right=st.lists(
            st.tuples(st.integers(0, 2), st.integers(0, 50)), min_size=0, max_size=15
        ),
        tol=st.one_of(st.none(), st.integers(1, 20)),
    )
    @SLOW
    def test_matches_pandas_merge_asof(self, spark, left, right, tol):
        """asof_join(backward) == pandas.merge_asof per key, including
        the tolerance gate. Right timestamps are deduplicated per key
        (at equal ts the carried payload is ordering-dependent in BOTH
        implementations, so ties are excluded from the property)."""
        import pandas as pd

        from hebrew_tutor_data_pipeline_spark.operators.asof import asof_join

        right_dedup: dict = {}
        for kk, tt in right:
            right_dedup[(kk, tt)] = True
        right = sorted(right_dedup)

        ldf = spark.createDataFrame(
            [(k, float(t), i) for i, (k, t) in enumerate(left)], ["k", "t", "lid"]
        )
        if right:
            rdf = spark.createDataFrame(
                [(k, float(t), float(t) * 10) for k, t in right], ["k", "t", "payload"]
            )
        else:
            rdf = spark.createDataFrame([], "k bigint, t double, payload double")
        got = {
            r["lid"]: r["payload_right"]
            for r in asof_join(
                ldf, rdf, ["k"], "t", "t", tolerance=float(tol) if tol else None
            ).collect()
        }

        lp = pd.DataFrame(
            [(k, float(t), i) for i, (k, t) in enumerate(left)],
            columns=["k", "t", "lid"],
        ).sort_values(["t", "lid"])
        rp = (
            pd.DataFrame(
                [(k, float(t), float(t) * 10) for k, t in right],
                columns=["k", "t", "payload"],
            )
            # an empty literal frame defaults to object dtypes, which
            # merge_asof rejects — pin the schema like the Spark side
            .astype({"k": "int64", "t": "float64", "payload": "float64"})
            .sort_values(["t", "k"])
        )
        merged = pd.merge_asof(
            lp,
            rp,
            on="t",
            by="k",
            direction="backward",
            tolerance=float(tol) if tol else None,
        )
        want = {
            int(r.lid): (None if pd.isna(r.payload) else float(r.payload))
            for r in merged.itertuples()
        }
        assert got == want


def _py_duplicate_spans(
    docs: list[list[str]], n: int, min_count: int = 2
) -> set[tuple[int, int, int]]:
    """Pure-Python reference for duplicate_spans (Lee et al., ACL 2022):
    count token n-grams corpus-wide by VALUE — the exact ground truth
    the engine's 62-bit combined keys must reproduce (a lone base-31
    roll demonstrably collides: 'aa ba' vs 'ab aa' was a live
    falsifying example) — then merge duplicated occurrences into
    maximal spans."""
    from collections import Counter

    grams: Counter = Counter()
    per_doc: list[list[int]] = []
    for toks in docs:
        positions = []
        for i in range(len(toks) - n + 1):
            g = tuple(toks[i : i + n])
            grams[g] += 1
            positions.append(i)
        per_doc.append(positions)
    out = set()
    for doc_id, toks in enumerate(docs):
        hits = [
            i
            for i in per_doc[doc_id]
            if grams[tuple(toks[i : i + n])] >= min_count
        ]
        start = end = None
        for i in hits:
            if start is None:
                start, end = i, i + n
            elif i > end:
                out.add((doc_id, start, end))
                start, end = i, i + n
            else:
                end = i + n
        if start is not None:
            out.add((doc_id, start, end))
    return out


class TestDuplicateSpanProperties:
    @given(
        docs=st.lists(
            st.lists(
                st.sampled_from(["aa", "ab", "ba", "x"]),
                min_size=0,
                max_size=16,
            ),
            min_size=1,
            max_size=4,
        ),
        n=st.integers(min_value=2, max_value=4),
    )
    @SLOW
    def test_matches_python_reference(self, spark, docs, n):
        """Spark duplicate_spans equals the straightforward Python scan
        on arbitrary token lists — span starts, ends, and doc routing.
        The tiny alphabet forces frequent cross-doc and same-doc n-gram
        repeats, exercising the merge path hard."""
        from hebrew_tutor_data_pipeline_spark.operators.dedup import duplicate_spans

        rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        got = {
            (r["id"], r["span_start"], r["span_end"])
            for r in duplicate_spans(df, "doc_id", "text", n=n).collect()
        }
        assert got == _py_duplicate_spans(docs, n)


def _py_bpe_merges(docs: list[list[str]], rounds: int) -> list[tuple[int, str, str, int]]:
    """Pure-Python reference of the BPE merge loop: top adjacent pair by
    (count DESC, left, right), greedy-leftmost non-overlapping fuse."""
    from collections import Counter

    docs = [list(d) for d in docs]
    out = []
    for rnd in range(1, rounds + 1):
        counts: Counter = Counter()
        for d in docs:
            for a, b in zip(d, d[1:]):
                counts[(a, b)] += 1
        if not counts:
            break
        (l, r), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        out.append((rnd, l, r, c))
        fused = l + "+" + r
        new_docs = []
        for d in docs:
            nd, i = [], 0
            while i < len(d):
                if i + 1 < len(d) and d[i] == l and d[i + 1] == r:
                    nd.append(fused)
                    i += 2
                else:
                    nd.append(d[i])
                    i += 1
            new_docs.append(nd)
        docs = new_docs
    return out


class TestBpeProperties:
    @given(
        docs=st.lists(
            st.lists(st.sampled_from(["a", "b", "ab", "a+b"]), min_size=0, max_size=12),
            min_size=1,
            max_size=4,
        ),
        rounds=st.integers(min_value=1, max_value=3),
    )
    @SLOW
    def test_matches_python_reference(self, spark, docs, rounds):
        """The Spark merge loop equals the straightforward Python BPE on
        arbitrary token lists — pair choice, tiebreaks, and the greedy
        fuse. The alphabet includes 'ab' and a literal 'a+b' token so
        fused-token aliasing (a fresh a+b vs a pre-existing one) is
        exercised."""
        from hebrew_tutor_data_pipeline_spark.operators.bpe import bpe_merges

        rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        got = [tuple(r) for r in bpe_merges(df, "doc_id", "text", rounds=rounds).collect()]
        assert got == _py_bpe_merges(docs, rounds)
