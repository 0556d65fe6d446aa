"""Generate statistically self-similar scale-up corpora for measured
scaling evidence (VERDICT r04 'what's missing' #2).

The driver's testdata tops out at sf0.1 (5k documents / 2k embeddings);
every 100 TB claim above that was argued from plan shape. A naive "K
copies of sf0.1" corpus is NOT a valid scaling family: with a ~31-word
vocabulary, cross-copy trigram collisions merge posting groups and
inflate candidate pairs superlinearly (measured 6.8× shuffle for 3×
docs), so runtime growth would measure the data artifact, not the
engine. Instead this tool refits sf0.1's empirical generative process
and samples NEW corpora from it:

- documents: token unigram distribution, doc-length distribution, lang
  distribution, and source fan-out are the sf0.1 empirical ones;
  near-duplicate structure is planted at sf0.1's measured rate (~256
  jaccard≥0.5 pairs per 5k docs → 5% of docs are 10%-token-mutated
  copies of an earlier doc, 0.16% exact copies). Every distributional
  fraction (df spectra, dup rate, length mix) is scale-invariant by
  construction, so candidate pairs and cluster counts grow ~linearly
  and the fractional df-prune keeps its meaning at every K.
- embeddings: per-label Gaussian clusters (mean + per-dim std refit
  from sf0.1's 10 labels), L2-normalized, at the sf0.1 vectors:docs
  ratio (0.4).
- one RNG seed, documents drawn sequentially → each smaller scale is a
  PREFIX of every larger one (and doc_id/vec_id < panels select the
  same-natured rows at every K).
- every non-scaled sf0.1 table is hard-copied in so incidental
  dimension loads keep working.

Multi-file parquet output (~50k docs per file) so Spark gets natural
input splits, like a real ingest.

Usage: python tools/make_scale_data.py OUT_BASE K [K ...]
  K is the multiplier over sf0.1 (K=10 → 50k docs / 20k vectors);
  writes OUT_BASE/x{K}/.
"""

from __future__ import annotations

import shutil
import sys
from collections import Counter
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = Path("/root/testdata/sf0.1")
SEED = 20260814
DOCS_PER_FILE = 50_000
P_NEAR_DUP = 0.05
P_EXACT_DUP = 0.0016
MUTATE_PROB = 0.10


def _doc_model():
    t = pq.read_table(SRC / "documents.parquet")
    texts = t.column("text").to_pylist()
    langs = t.column("lang").to_pylist()
    sources = t.column("source").to_pylist()
    tok_counts: Counter[str] = Counter()
    lengths = []
    for tx in texts:
        ws = tx.split()
        lengths.append(len(ws))
        tok_counts.update(ws)
    vocab = sorted(tok_counts)
    probs = np.array([tok_counts[w] for w in vocab], dtype=np.float64)
    probs /= probs.sum()
    lang_vals, lang_counts = np.unique(langs, return_counts=True)
    src_vals = sorted(set(sources))
    return {
        "vocab": np.array(vocab),
        "probs": probs,
        "lengths": np.array(lengths),
        "langs": lang_vals,
        "lang_probs": lang_counts / lang_counts.sum(),
        "sources": np.array(src_vals),
    }


def _emb_model():
    t = pq.read_table(SRC / "embeddings.parquet")
    e = np.array(t.column("embedding").to_pylist(), dtype=np.float32)
    lab = np.array(t.column("label").to_pylist())
    labels = np.unique(lab)
    means = np.stack([e[lab == l].mean(0) for l in labels])
    stds = np.stack([e[lab == l].std(0) for l in labels])
    counts = np.array([(lab == l).sum() for l in labels], dtype=np.float64)
    return {
        "labels": labels,
        "means": means,
        "stds": stds,
        "label_probs": counts / counts.sum(),
        "ratio": len(e) / pq.read_metadata(SRC / "documents.parquet").num_rows,
    }


def gen_documents(out: Path, n: int, model: dict) -> None:
    rng = np.random.default_rng(SEED)
    out_dir = out / "documents.parquet"
    out_dir.mkdir(parents=True, exist_ok=True)
    vocab, probs = model["vocab"], model["probs"]
    recent: list[list[str]] = []  # dup-source pool (bounded)
    buf_rows: dict[str, list] = {k: [] for k in ("doc_id", "text", "lang", "source", "n_chars")}
    file_idx = 0

    def flush() -> None:
        nonlocal file_idx
        if not buf_rows["doc_id"]:
            return
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(buf_rows["doc_id"], pa.int64()),
                    "text": pa.array(buf_rows["text"]),
                    "lang": pa.array(buf_rows["lang"]),
                    "source": pa.array(buf_rows["source"]),
                    "n_chars": pa.array(buf_rows["n_chars"], pa.int64()),
                }
            ),
            out_dir / f"part-{file_idx:05d}.parquet",
        )
        for v in buf_rows.values():
            v.clear()
        file_idx += 1

    for i in range(n):
        r = rng.random()
        if recent and r < P_EXACT_DUP:
            toks = recent[rng.integers(len(recent))]
        elif recent and r < P_EXACT_DUP + P_NEAR_DUP:
            base = recent[rng.integers(len(recent))]
            mut = rng.random(len(base)) < MUTATE_PROB
            repl = rng.choice(vocab, size=int(mut.sum()), p=probs)
            toks = list(base)
            j = 0
            for pos in np.flatnonzero(mut):
                toks[pos] = str(repl[j])
                j += 1
        else:
            ln = int(model["lengths"][rng.integers(len(model["lengths"]))])
            toks = [str(w) for w in rng.choice(vocab, size=ln, p=probs)]
        if len(recent) < 2048:
            recent.append(toks)
        elif rng.random() < 0.01:  # reservoir-ish refresh keeps pool current
            recent[rng.integers(len(recent))] = toks
        text = " ".join(toks)
        buf_rows["doc_id"].append(i)
        buf_rows["text"].append(text)
        buf_rows["lang"].append(
            str(model["langs"][rng.choice(len(model["langs"]), p=model["lang_probs"])])
        )
        buf_rows["source"].append(str(model["sources"][rng.integers(len(model["sources"]))]))
        buf_rows["n_chars"].append(len(text))
        if len(buf_rows["doc_id"]) >= DOCS_PER_FILE:
            flush()
    flush()


def gen_embeddings(out: Path, n: int, model: dict) -> None:
    rng = np.random.default_rng(SEED + 1)
    out_dir = out / "embeddings.parquet"
    out_dir.mkdir(parents=True, exist_ok=True)
    file_idx = 0
    written = 0
    chunk = DOCS_PER_FILE
    while written < n:
        m = min(chunk, n - written)
        li = rng.choice(len(model["labels"]), size=m, p=model["label_probs"])
        z = rng.standard_normal((m, model["means"].shape[1])).astype(np.float32)
        v = model["means"][li] + model["stds"][li] * z
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array(
                        np.arange(written, written + m, dtype=np.int64), pa.int64()
                    ),
                    "embedding": pa.array(
                        list(v.astype(np.float32)), pa.list_(pa.float32())
                    ),
                    "label": pa.array(
                        model["labels"][li].astype(np.int32), pa.int32()
                    ),
                }
            ),
            out_dir / f"part-{file_idx:05d}.parquet",
        )
        written += m
        file_idx += 1


#: Events arm (VERDICT r09 'Next round' #1): events/lineitem are
#: hard-copied (fixed-size) in the x{K} trees, so every event-shaped
#: entry's scale probe was vacuous by construction. This arm REGENERATES
#: events.parquet inside existing x{K} dirs from sf0.1's fitted
#: generative process, scaled the way a real event stream grows: users
#: ∝ K with the per-user rate held constant (per-user expected count
#: stays ≈66.7 — windows/sessions per user stay bounded; the number of
#: groups grows), over the SAME 30-day span (global Poisson rate ∝ K).
#: Fitted at sf0.1: uniform 5-way type mix, value ~ Exponential(50)
#: rounded to 2 dp (frac<1 = 0.0190 ≈ 1−e^(−1/50)), props = {"k":
#: uniform 0..99}, user_id uniform over 0..1500K−1, timestamps the
#: order statistics of uniforms over the span (≡ conditioned Poisson),
#: event_id = arrival rank — exactly sf0.1's shape at K=1.
EVENTS_BASE = 100_000
USERS_BASE = 1_500
SPAN_START_US = np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)
SPAN_END_US = np.datetime64("2024-01-31T00:00:00", "us").astype(np.int64)
EVENT_TYPES = np.array(["click", "error", "purchase", "signup", "view"])
EVENTS_PER_FILE = 1_000_000


def gen_events(out: Path, k: int) -> None:
    rng = np.random.default_rng(SEED + 2)
    n, n_users = EVENTS_BASE * k, USERS_BASE * k
    out_path = out / "events.parquet"
    if out_path.is_file():
        out_path.unlink()
    elif out_path.exists():
        shutil.rmtree(out_path)
    out_path.mkdir(parents=True)
    ts = np.sort(
        rng.integers(SPAN_START_US, SPAN_END_US, size=n, dtype=np.int64)
    )
    for file_idx, lo in enumerate(range(0, n, EVENTS_PER_FILE)):
        hi = min(lo + EVENTS_PER_FILE, n)
        m = hi - lo
        value = np.floor(rng.exponential(50.0, size=m) * 100 + 0.5) / 100
        props = np.char.add(
            np.char.add('{"k": ', rng.integers(0, 100, size=m).astype(str)), "}"
        )
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array(np.arange(lo, hi, dtype=np.int64), pa.int64()),
                    "ts": pa.array(ts[lo:hi], pa.timestamp("us")),
                    "user_id": pa.array(
                        rng.integers(0, n_users, size=m, dtype=np.int64), pa.int64()
                    ),
                    "event_type": pa.array(EVENT_TYPES[rng.integers(0, 5, size=m)]),
                    "value": pa.array(value, pa.float64()),
                    "props": pa.array(props),
                }
            ),
            out_path / f"part-{file_idx:05d}.parquet",
        )


#: Zipf arm (VERDICT r06 'Next round' #7): the empirical sf0.1 vocab is
#: ~31 types — a DEGENERATE spectrum on which every trigram goes common
#: as the corpus grows, so df-caps provably collapse to zero recall
#: there (r06_recall.json). Real web text is heavy-tailed; this arm
#: samples the same doc-length/dup structure from a synthetic Zipf
#: vocabulary so the df-cap claim can be MEASURED on a realistic
#: spectrum instead of argued.
ZIPF_VOCAB_SIZE = 30_000
ZIPF_EXPONENT = 1.05


def _zipf_model(doc_model: dict) -> dict:
    ranks = np.arange(1, ZIPF_VOCAB_SIZE + 1, dtype=np.float64)
    probs = ranks ** (-ZIPF_EXPONENT)
    probs /= probs.sum()
    m = dict(doc_model)
    m["vocab"] = np.array([f"w{i:05d}" for i in range(ZIPF_VOCAB_SIZE)])
    m["probs"] = probs
    return m


def main() -> None:
    base = Path(sys.argv[1])
    rest = sys.argv[2:]
    zipf = "--zipf" in rest
    events = "--events" in rest
    ks = [int(a) for a in rest if a not in ("--zipf", "--events")] or [10]
    if events:
        # regenerate ONLY events.parquet inside existing x{K} trees
        for k in ks:
            out = base / f"x{k}"
            out.mkdir(parents=True, exist_ok=True)
            gen_events(out, k)
            print(f"x{k}: events regenerated ({EVENTS_BASE * k} rows, {USERS_BASE * k} users)")
        return
    n_docs_base = pq.read_metadata(SRC / "documents.parquet").num_rows
    doc_model = _doc_model()
    if zipf:
        doc_model = _zipf_model(doc_model)
    emb_model = _emb_model()
    prefix = "zipf_x" if zipf else "x"
    for k in ks:
        out = base / f"{prefix}{k}"
        if out.exists():
            shutil.rmtree(out)
        out.mkdir(parents=True)
        n = n_docs_base * k
        gen_documents(out, n, doc_model)
        gen_embeddings(out, int(round(n * emb_model["ratio"])), emb_model)
        for f in SRC.glob("*.parquet"):
            if f.stem in ("documents", "embeddings"):
                continue
            shutil.copy(f, out / f.name)
        print(f"{prefix}{k}: {out} ({n} docs)")


if __name__ == "__main__":
    main()
