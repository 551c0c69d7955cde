"""Unit tests for the LLM-pipeline operators: dedup recall on known
duplicates, similarity ranking sanity, multimodal plumbing, text edge cases.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tickerlake_spark.operators.dedup import (
    embedding_neardup_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    signature_table,
    simhash_pairs,
)
from tickerlake_spark.operators.multimodal import (
    attach_fake_media,
    extract_features,
    resize_images,
    sample_frames,
)
from tickerlake_spark.operators.similarity import brute_force_topk, lsh_ann_topk
from tickerlake_spark.operators.text_analysis import detect_language, fingerprint, text_stats

BASE = (
    "the quick brown fox jumps over the lazy dog and runs far away to the hills "
    "where it rests for a while and then returns home in the evening"
)


@pytest.fixture(scope="module")
def doc_corpus(spark):
    rows = [
        (1, BASE),
        (2, BASE + " tail"),          # near-dup of 1
        (3, BASE),                    # exact dup of 1
        (4, "el perro grande corre por la calle y la casa es de madera por que si"),
        (5, "completely different words about spark catalyst optimizer plans"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_keeps_lowest_id(spark, doc_corpus):
    out = exact_dedup(doc_corpus, "text", "doc_id")
    ids = {r.doc_id for r in out.collect()}
    assert ids == {1, 2, 4, 5}  # 3 collapsed into 1


def test_minhash_finds_near_and_exact_dups(spark, doc_corpus):
    pairs = {
        (r.id_a, r.id_b): r.jaccard
        for r in minhash_lsh_pairs(doc_corpus, jaccard_threshold=0.5).collect()
    }
    assert (1, 3) in pairs and pairs[(1, 3)] == 1.0
    assert (1, 2) in pairs and 0.8 < pairs[(1, 2)] < 1.0
    assert not any({a, b} == {1, 5} for a, b in pairs)


def test_persisted_signatures_match_and_skip_reshingling(spark, doc_corpus, tmp_path):
    """signature_table written to parquet and fed back via signatures= must
    (a) produce identical pairs and (b) never touch the corpus text again —
    the 100 TB repeated-dedup path reads ~40 bytes/doc, not documents."""
    path = str(tmp_path / "sigs")
    signature_table(doc_corpus).write.parquet(path)
    persisted = spark.read.parquet(path)

    from_text = {
        (r.id_a, r.id_b): r.jaccard
        for r in minhash_lsh_pairs(doc_corpus, jaccard_threshold=0.5).collect()
    }
    from_sigs_df = minhash_lsh_pairs(signatures=persisted, jaccard_threshold=0.5)
    from_sigs = {
        (r.id_a, r.id_b): r.jaccard for r in from_sigs_df.collect()
    }
    assert from_sigs == from_text and (1, 3) in from_sigs

    # plan gate: no tokenizer/shingler in the persisted-signature plan —
    # shingling is split+lower (tokens()) over the text column, neither of
    # which may appear when signatures are read from storage
    plan = from_sigs_df._jdf.queryExecution().executedPlan().toString()
    assert "split(" not in plan and "text#" not in plan

    with pytest.raises(ValueError, match="either df"):
        minhash_lsh_pairs()


def test_simhash_pairs_banding_bound(spark, doc_corpus):
    pairs = {(r.id_a, r.id_b) for r in simhash_pairs(doc_corpus, max_hamming=3).collect()}
    assert (1, 3) in pairs  # identical text -> hamming 0
    with pytest.raises(ValueError, match="pigeonhole"):
        simhash_pairs(doc_corpus, bits=32, max_hamming=4, band_bits=8)


def test_ngram_jaccard_exact(spark, doc_corpus):
    pairs = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(doc_corpus, threshold=0.3).collect()
    }
    assert pairs[(1, 3)] == 1.0
    assert (4, 5) not in pairs


def test_embedding_neardup_and_topk(spark):
    import math

    def unit(seed: int, bump: float = 0.0) -> list[float]:
        v = [math.sin(seed * 31 + i) for i in range(16)]
        v[0] += bump
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    rows = [(i, unit(i)) for i in range(20)] + [(100, unit(0, 0.05))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    near = {
        (r.id_a, r.id_b)
        for r in embedding_neardup_pairs(
            df, vec_col="embedding", threshold=0.99
        ).collect()
    }
    assert (0, 100) in near

    top = brute_force_topk(df, unit(0), k=3).collect()
    assert top[0].id == 0 and top[0].cosine == pytest.approx(1.0)
    assert top[1].id == 100

    approx = lsh_ann_topk(df, unit(0), k=3, n_planes=6)
    assert approx.first().id == 0  # query's own vector always in its bucket


def test_multimodal_plumbing(spark, doc_corpus):
    media = attach_fake_media(doc_corpus)
    feats = {r.media_id: r for r in extract_features(media).collect()}
    assert feats[1].n_bytes == len(BASE.encode())
    assert feats[1].feat_mean == pytest.approx(
        sum(BASE.encode()) / len(BASE.encode())
    )
    resized = resize_images(media, 8, 8).collect()
    assert all(len(r.data) == 64 and r.width == 8 for r in resized)
    frames = sample_frames(media, every_ms=100)
    vid = media.filter(F.col("modality") == "video").count()
    assert frames.count() >= vid  # at least frame 0 per video


def test_png_codec_roundtrip_all_filters():
    """decode_png_gray must invert encode_png_gray AND unfilter scanlines
    written with every PNG filter type (1=Sub, 2=Up, 3=Average, 4=Paeth),
    not just the encoder's own filter 0 — conforming external encoders
    emit all five."""
    import struct
    import zlib

    from tickerlake_spark.operators.multimodal import (
        decode_png_gray,
        encode_png_gray,
    )

    pix = bytes((i * 37 + 11) % 256 for i in range(12 * 7))
    assert decode_png_gray(encode_png_gray(12, 7, pix)) == (12, 7, pix)

    # hand-build a PNG whose rows use filters 1-4 (reference-filter each
    # scanline per the spec, then check the decoder reconstructs it)
    w, h = 5, 4
    rows = [bytes((x * 31 + y * 57) % 256 for x in range(w)) for y in range(h)]
    raw = bytearray()
    for y, ftype in zip(range(h), (1, 2, 3, 4)):
        raw.append(ftype)
        prev = rows[y - 1] if y > 0 else bytes(w)
        for x in range(w):
            a = rows[y][x - 1] if x > 0 else 0
            b = prev[x]
            c = prev[x - 1] if x > 0 else 0
            if ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            raw.append((rows[y][x] - pred) & 0xFF)

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    assert decode_png_gray(png) == (w, h, b"".join(rows))


def test_binaryfile_ingest_decodes_real_pngs(spark, tmp_path):
    """read_media_dir: actual PNG files on disk -> binaryFile scan ->
    real decode in extract_features; features match the known pixels."""
    from tickerlake_spark.operators.multimodal import (
        encode_png_gray,
        extract_features,
        read_media_dir,
    )

    want = {}
    for i in range(3):
        pix = bytes((x * (i + 3)) % 256 for x in range(6 * 6))
        (tmp_path / f"img_{i}.png").write_bytes(encode_png_gray(6, 6, pix))
        want[f"img_{i}.png"] = (sum(pix) / 36.0, max(pix))
    media = read_media_dir(spark, str(tmp_path))
    assert {r.modality for r in media.select("modality").collect()} == {"image"}
    feats = extract_features(media).collect()
    assert len(feats) == 3
    got = sorted((r.n_bytes, round(r.feat_mean, 6), r.feat_max) for r in feats)
    exp = sorted((36, round(m, 6), mx) for m, mx in want.values())
    assert got == exp


def test_resize_images_real_nearest_neighbor(spark):
    """PNG inputs get a REAL resample: a 4x4 gradient downsized to 2x2
    must keep exactly the pixels at (0,0),(0,2),(2,0),(2,2) and re-encode
    as a decodable 2x2 PNG."""
    from tickerlake_spark.operators.multimodal import (
        decode_png_gray,
        encode_png_gray,
        resize_images,
    )

    pix = bytes(range(16))  # 4x4: row y = [4y .. 4y+3]
    df = spark.createDataFrame(
        [(1, "image", bytearray(encode_png_gray(4, 4, pix)))],
        "media_id long, modality string, data binary",
    )
    out = resize_images(df, 2, 2).collect()[0]
    assert (out.width, out.height) == (2, 2)
    assert decode_png_gray(bytes(out.data)) == (2, 2, bytes([0, 2, 8, 10]))


def test_text_stats_and_langid(spark, doc_corpus):
    stats = {r.doc_id: r for r in text_stats(doc_corpus).collect()}
    assert stats[1].n_tokens == len(BASE.split())
    assert stats[1].stopword_ratio > 0
    assert stats[1].is_quality  # long clean text
    assert not stats[5].is_quality  # only 8 tokens (< 10 minimum)

    langs = {r.doc_id: r.detected_lang for r in detect_language(doc_corpus).collect()}
    assert langs[1] == "en" and langs[4] == "es"
    assert langs[5] in ("und", "en")


def test_fingerprint_short_text_guard(spark):
    df = spark.createDataFrame([(1, "ab"), (2, "abcdefgh")], "doc_id long, text string")
    out = {r.doc_id: r for r in fingerprint(df).collect()}
    assert out[1].distinct_shingles_5 == 0  # shorter than one shingle
    assert out[2].distinct_shingles_5 == 4


def test_repetition_stats_edges(spark):
    from tickerlake_spark.operators.text_analysis import repetition_stats

    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam"),  # fully repetitive
            (2, "one two three four five six"),  # no repetition
            (3, "hi"),  # shorter than any n-gram
            (4, "go go stop go go stop go go"),  # partial repetition
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in repetition_stats(df).collect()}
    assert out[1].rep_2gram == pytest.approx(1 - 1 / 5)
    assert out[1].is_repetitious
    assert out[2].rep_2gram == 0.0 and out[2].rep_3gram == 0.0
    assert not out[2].is_repetitious
    assert out[3].rep_2gram == 0.0 and not out[3].is_repetitious
    # doc 4: 7 bigrams, distinct {go go, go stop, stop go} = 3 -> 4/7
    assert out[4].rep_2gram == pytest.approx(1 - 3 / 7)


def test_salted_band_join_equals_plain_on_boilerplate_corpus(spark):
    """Skew gate for the LSH band self-join (boilerplate-heavy corpus).

    One band key holding ~10% of docs is the pathological dedup input: the
    plain self-join gives one reducer O((0.1N)^2) work. band_salt switches to
    the triangle-replicate skew join, which must (a) produce EXACTLY the same
    pairs, (b) find the full boilerplate clique, and (c) actually carry the
    salt cells in the join key so the hot bucket is spread across salt^2
    reducers.
    """
    import random

    from tickerlake_spark.operators.dedup import _band_self_join, minhash_lsh_pairs

    rng = random.Random(7)
    words = [f"w{i}" for i in range(500)]
    boiler = "subscribe to our newsletter terms of service apply all rights reserved"
    rows = [(i, boiler) for i in range(10)] + [
        (i, " ".join(rng.choice(words) for _ in range(30))) for i in range(10, 100)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    plain = {
        (r.id_a, r.id_b, round(r.jaccard, 9))
        for r in minhash_lsh_pairs(df, jaccard_threshold=0.5).collect()
    }
    salted_df = minhash_lsh_pairs(df, jaccard_threshold=0.5, band_salt=4)
    salted = {
        (r.id_a, r.id_b, round(r.jaccard, 9))
        for r in salted_df.collect()
    }
    assert salted == plain
    clique = {(a, b) for a, b, _ in salted if a < 10 and b < 10}
    assert clique == {(a, b) for a in range(10) for b in range(a + 1, 10)}

    plan = salted_df._jdf.queryExecution().executedPlan().toString()
    assert "__i" in plan and "__j" in plan

    # reducer-balance check on the raw cells: with salt s, no (band, key,
    # i, j) cell may hold more than ceil(hot/s)^2-ish of the hot bucket's
    # pair workload; assert the max per-cell pair count shrank vs unsalted.
    banded = spark.createDataFrame(
        [(d, 0, "hot") for d in range(10)] + [(d, 0, f"k{d}") for d in range(10, 100)],
        "doc_id long, band int, key string",
    )
    plain_pairs = _band_self_join(banded, 0)
    salted_pairs = _band_self_join(banded, 4)
    assert sorted(map(tuple, plain_pairs.collect())) == sorted(
        map(tuple, salted_pairs.collect())
    )


def test_line_dedup_strips_exactly_the_boilerplate(spark, sf_dir):
    """q121: every 7th doc gets the 8-word boilerplate header injected; the
    operator must always strip that chunk (the synthetic corpus also
    repeats some 8-grams >= 3x template-style, so those go too), and
    reassembly must preserve word order."""
    from tickerlake_spark.plans import QUERIES
    from tickerlake_spark.plans.catalog import _ensure_loaded, load_table

    _ensure_loaded()
    out = {
        r["doc_id"]: r
        for r in QUERIES["q121_line_dedup"].fn(spark, sf_dir).collect()
    }
    orig = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
    }
    boiler_docs = [d for d in orig if d % 7 == 0]
    assert boiler_docs
    for d in boiler_docs:
        # the boilerplate chunk itself must always be gone (its words are
        # outside the corpus vocabulary, so substring check is unambiguous)
        assert out[d]["n_removed"] >= 1
        assert "subscribe" not in out[d]["kept_text"]
    # removal never reorders: every doc's kept words are an in-order
    # subsequence of its (possibly boilerplate-prefixed) corpus text
    for d, r in out.items():
        corpus_words = (
            ("subscribe now to our daily newsletter for updates " + orig[d])
            if d % 7 == 0
            else orig[d]
        ).split(" ")
        kept = r["kept_text"].split(" ") if r["kept_text"] else []
        it = iter(corpus_words)
        assert all(w in it for w in kept), f"doc {d} reordered"


def test_shard_assignment_packs_contiguously(spark, sf_dir):
    """q124: shard ids must start at 0, be contiguous, and every shard
    except the last must END because adding its last doc crossed the
    budget boundary (i.e., token ranges tile [0, total) in 2000-token
    strips)."""
    from tickerlake_spark.plans import QUERIES
    from tickerlake_spark.plans.catalog import _ensure_loaded
    from tickerlake_spark.plans.q_curation import _SHARD_BUDGET

    _ensure_loaded()
    rows = QUERIES["q124_shard_assignment"].fn(spark, sf_dir).collect()
    shards = sorted({r["shard_id"] for r in rows})
    assert shards == list(range(len(shards)))
    for r in rows:
        start = r["tokens_through"] - r["n_tok"]
        assert r["shard_id"] == start // _SHARD_BUDGET


def test_domain_mixture_rates_monotone_in_temperature(spark, sf_dir):
    """q122: sqrt-temperature flattening means smaller sources are
    upsampled — sample_rate must be non-increasing in source token mass,
    and every rate in (0, 1]."""
    from tickerlake_spark.plans import QUERIES
    from tickerlake_spark.plans.catalog import _ensure_loaded, load_table
    from pyspark.sql import functions as F

    _ensure_loaded()
    rates = {
        r["source"]: r["sample_rate"]
        for r in QUERIES["q122_domain_mixture_sample"].fn(spark, sf_dir).collect()
    }
    mass = {
        r["source"]: r["tok"]
        for r in load_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.sum(F.size(F.split("text", " "))).alias("tok"))
        .collect()
    }
    assert all(0 < v <= 1.0 for v in rates.values())
    ordered = sorted(rates, key=lambda s: mass[s])
    for small, big in zip(ordered, ordered[1:]):
        assert rates[small] >= rates[big] - 1e-12


def test_curation_pipeline_end_to_end(spark, sf_dir, tmp_path):
    """run_curation over a corpus with injected exact + near duplicates:
    stage counts are monotone non-increasing, the exact stage removes the
    exact copies, the near-dup stage removes the mutated copies, and the
    shard layout tiles the surviving tokens in budget-sized strips."""
    from pyspark.sql import functions as F

    from tickerlake_spark.curation_pipeline import run_curation
    from tickerlake_spark.plans.catalog import load_table
    from tickerlake_spark.storage.io import read_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source"
    )
    exact = docs.filter(F.col("doc_id") < 30).select(
        (F.col("doc_id") + 10000).alias("doc_id"), "text", "source"
    )
    near = docs.filter((F.col("doc_id") >= 30) & (F.col("doc_id") < 50)).select(
        (F.col("doc_id") + 20000).alias("doc_id"),
        F.concat("text", F.lit(" qq"), F.col("doc_id")).alias("text"),
        "source",
    )
    corpus = docs.unionByName(exact).unionByName(near)

    root = str(tmp_path / "curated")
    stats = run_curation(spark, corpus, root, shard_budget=1000)

    order = ["input", "exact_dedup", "near_dedup", "stripped", "quality", "sampled"]
    for a, b in zip(order, order[1:]):
        assert stats[b] <= stats[a], stats
    # all 30 exact copies die in stage 1 (keep-min-id keeps the originals)
    assert stats["input"] - stats["exact_dedup"] == 30, stats
    # all 20 one-token mutations die in stage 2 (canonical = min id) —
    # consistent with the strict id sweep below; more may die if the
    # synthetic corpus has natural near-dups
    assert stats["near_dedup"] <= stats["exact_dedup"] - 20, stats
    kept_ids = {
        r["doc_id"] for r in read_table(spark, root + "/near_dedup").collect()
    }
    assert not any(i >= 10000 for i in kept_ids), "an injected dup survived"
    # shard layout: Hive-partitioned by shard_id, contiguous from 0
    shard_ids = sorted(
        r["shard_id"]
        for r in read_table(spark, root + "/shards")
        .select("shard_id")
        .distinct()
        .collect()
    )
    assert shard_ids == list(range(len(shard_ids)))
    assert stats["shards"] == stats["sampled"]


def test_curation_pipeline_semantic_stage(spark, tmp_path):
    """run_curation with embeddings: a paraphrase pair (different text,
    near-identical vectors) that lexical dedup cannot catch must be dropped
    by the SemDeDup stage — keep-min-id."""
    import math

    from pyspark.sql import functions as F

    from tickerlake_spark.curation_pipeline import run_curation
    from tickerlake_spark.storage.io import read_table

    def vec(seed: int, bump: float = 0.0) -> list[float]:
        v = [math.sin(seed * 13 + i) for i in range(16)]
        v[0] += bump
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    # every doc lexically unique (disjoint word sets) so the MinHash stage
    # finds nothing and only the semantic stage can link the twins
    docs = spark.createDataFrame(
        [
            (
                i,
                " ".join(f"w{i}x{j}" for j in range(10)),
                f"s{i % 2}",
            )
            for i in range(8)
        ],
        "doc_id long, text string, source string",
    )
    # doc 7 is a semantic twin of doc 1 (tiny vector perturbation); every
    # other doc is far away. Lexically 1 and 7 differ (different tails and
    # shingle sets), so only the semantic stage can link them.
    emb = spark.createDataFrame(
        [(i, vec(i)) for i in range(7)] + [(7, vec(1, 0.02))],
        "doc_id long, embedding array<double>",
    )

    root = str(tmp_path / "sem_curated")
    stats = run_curation(
        spark,
        docs,
        root,
        embeddings=emb,
        semantic_threshold=0.98,
        semantic_k=2,
        budget_frac=0.9,
        shard_budget=50,
    )
    kept = {
        r["doc_id"] for r in read_table(spark, root + "/near_dedup").collect()
    }
    assert 1 in kept and 7 not in kept, (stats, sorted(kept))
    assert stats["near_dedup"] == 7


# ---------------------------------------------------------------------------
# BPE tokenizer training (operators/bpe.py)


def _py_bpe_reference(word_freqs, n_merges, end="</w>"):
    """Sennrich-style reference BPE in pure Python: pair counts over the
    word-frequency dict, argmax (freq desc, pair asc), greedy left-to-right
    non-overlapping apply."""
    vocab = {}
    for w, f in word_freqs.items():
        vocab[tuple(list(w) + [end])] = vocab.get(tuple(list(w) + [end]), 0) + f
    merges = []
    for _ in range(n_merges):
        pc = {}
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] = pc.get((syms[i], syms[i + 1]), 0) + f
        if not pc:
            break
        (a, b), n = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b, n))
        new = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new[tuple(out)] = new.get(tuple(out), 0) + f
        vocab = new
    return merges, vocab


def test_bpe_train_matches_python_reference(spark, sf_dir):
    """Distributed BPE training == the pure-Python reference on the same
    corpus: identical merge list (order, pairs, frequencies)."""
    from tickerlake_spark.operators.bpe import bpe_train, word_frequencies
    from tickerlake_spark.plans.catalog import load_table

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    wf = {r["word"]: r["freq"] for r in word_frequencies(docs).collect()}
    want, _ = _py_bpe_reference(wf, 15)
    got = bpe_train(docs, n_merges=15)
    assert got == want and len(got) == 15


def test_bpe_segment_matches_training_state(spark, sf_dir):
    """Applying the learned merges to raw words reproduces the trained
    symbol table exactly (encode path == train-time state)."""
    from tickerlake_spark.operators.bpe import (
        bpe_segment,
        bpe_train,
        word_frequencies,
    )
    from tickerlake_spark.plans.catalog import load_table

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 120)
    merges = bpe_train(docs, n_merges=10)
    wf = {r["word"]: r["freq"] for r in word_frequencies(docs).collect()}
    _, final_vocab = _py_bpe_reference(wf, 10)
    words = word_frequencies(docs).select("word")
    seg = {
        r["word"]: tuple(r["syms"])
        for r in bpe_segment(words, merges).collect()
    }
    want = {}
    for syms, _f in final_vocab.items():
        word = "".join(syms).removesuffix("</w>")
        want[word] = syms
    # reconstruct the raw word from the symbol tuple to compare keyed
    assert len(seg) == len(want)
    for w, syms in seg.items():
        assert want[w] == syms, w
