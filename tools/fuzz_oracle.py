#!/usr/bin/env python3
"""Adversarial oracle fuzz: the driver fixtures are lowercase-ASCII-only,
so the whole cross-engine Unicode/whitespace parity class (code-point vs
UTF-16 folding, Java-\\s vs RE2-\\s, NaN cosines from zero vectors) is
invisible to the normal gate. This tool generates a hostile
documents/embeddings pair — astral chars, KELVIN SIGN, vertical tab,
NBSP, empty and repetitive texts, zero/duplicate/near-dup vectors —
symlinks the real sf0.001 fixtures for the other tables, and runs the
document/embedding query families through the REAL gate
(graft.Verify subset -> tools/check.py DuckDB compare).

Usage: python3 tools/fuzz_oracle.py [seed] [workdir]
Exit 0 iff every fuzzed query hash-matches its oracle.

Excluded by documented contract: multimodal_* (their checksum oracles
replay byte-wise arithmetic char-wise, valid only on an ASCII corpus —
the operator scaladoc says so).
"""
import os, random, shutil, subprocess, sys
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURES = "/root/testdata/sf0.001"

DOC_QUERIES = """dedup_exact dedup_minhash dedup_keep_list dedup_ngram_jaccard
dedup_simhash_pairs simhash_fingerprint dedup_incremental dedup_keep_best
dedup_clusters dedup_substring dedup_containment chunk_dedup
chunk_content_defined chunk_text decontaminate_overlap bloom_membership
doc_fingerprint text_lang_id text_quality text_repetition text_normalize
token_counts tfidf_top_terms lm_bigram_score pii_redact boilerplate_flag
ngram_top_corpus source_overlap sample_stratified sample_fixed_per_lang
mix_rebalance length_buckets pack_sequences curate_corpus
split_leakage_safe bm25_rank tokenizer_vocab tokenizer_apply
cms_heavy_hitters sample_importance gopher_rules mix_temperature
mix_temperature_a25 ccnet_buckets c4_rules shard_shuffle
importance_hashed corpus_stats minhash_calibration
source_drift minhash_band_sweep dedup_cluster_stats
tokenizer_fertility pack_efficiency quality_funnel mix_epoch_plan
c4_span_dedup quality_classifier classifier_eval snapshot_diff
classifier_buckets corpus_diversity mix_unimax lm_trigram_score
dedup_winnow curriculum_plan rare_token_docs pmi_collocations
dedup_edit_blocked langid_eval hll_distinct text_readability
code_detect hll_overlap memorization_spans feature_chi2
ccnet_perplexity_buckets mix_doremi tokenizer_unigram
tokenizer_unigram_fertility dedup_url tokenizer_unigram_apply
mix_doremi_plan label_noise_detect pretrain_prep pretrain_prep_fixed
dedup_minhash_profile dedup_minhash_star dedup_minhash_capped
pretrain_prep_star pretrain_prep_capped""".split()

EMB_QUERIES = """ann_cosine_topk ann_cosine_bucketed ann_ivf_probe
ann_ivf_nprobe ann_ivf_pq ann_recall_report dedup_embedding_cosine
vector_norms embedding_quantize embedding_pq embedding_kmeans rank_fusion
dedup_semantic knn_label_probe ann_range_search hard_negatives
label_centroid_margin prototype_prune embedding_pca""".split()

ASCII_WORDS = ("spark join window data model train corpus token quality "
               "filter sample batch shard merge index scan probe the a of "
               "and cat dog fish bird x1 y2 z3").split()
UNICODE_WORDS = [
    "café", "straße", "École", "Kelvin",  # é ß É KELVIN
    "naïve", "über", "niño", "中文",   # ï ü ñ CJK
    "\U0001F600emoji", "mix\U0001F680ed",                      # astral
]
SEPS = [" ", "  ", "\t", "\n", "\x0b", "\f", "\r", " ", ", ", ". ", "! "]
LANGS = ["en", "en", "en", "es", "de", "fr", "und"]
SOURCES = ["web", "books", "code", "wiki"]


def make_text(rnd):
    kind = rnd.random()
    if kind < 0.05:
        return ""                                   # empty
    if kind < 0.10:
        return rnd.choice(["!!!", "...", "\x0b\x0b", "  ", "123"])
    if kind < 0.14:
        # c4_rules keyword hostility: the gate's page/line needles appear
        # in RAW text (not only via the deterministic injection), so both
        # engines must agree on substring hits over constructed lines that
        # mix raw keywords with ordinary tokens
        return rnd.choice([
            "lorem ipsum dolor sit amet the quick brown fox jumps over it",
            "enable javascript to view this site please and thank you now",
            "var x = { a: 1 } function y { return } the end of the page",
            "lorem ipsum " * rnd.randint(1, 6) + "tail",
        ])
    n = rnd.randint(3, 60)
    parts = []
    for _ in range(n):
        pool = ASCII_WORDS if rnd.random() < 0.8 else UNICODE_WORDS
        parts.append(rnd.choice(pool))
        parts.append(rnd.choice(SEPS))
    t = "".join(parts)
    if kind < 0.18:                                 # highly repetitive
        t = " ".join([rnd.choice(ASCII_WORDS)] * rnd.randint(10, 40))
    return t


def gen_documents(rnd, n=140):
    rows = []
    for i in range(n):
        t = make_text(rnd)
        rows.append([i, t, rnd.choice(LANGS), rnd.choice(SOURCES), len(t)])
    # near-dup pairs for the LSH families: copy with a one-token tail
    for i in range(0, n, 9):
        j = (i + 1) % n
        rows[j][1] = rows[i][1] + " tailtoken" + str(i)
        rows[j][4] = len(rows[j][1])
    # exact-dup pairs
    for i in range(0, n, 17):
        j = (i + 2) % n
        rows[j][1] = rows[i][1]
        rows[j][4] = rows[i][4]
    cols = list(zip(*rows))
    return pa.table({
        "doc_id": pa.array(cols[0], pa.int64()),
        "text": pa.array(cols[1], pa.string()),
        "lang": pa.array(cols[2], pa.string()),
        "source": pa.array(cols[3], pa.string()),
        "n_chars": pa.array(cols[4], pa.int64())})


def gen_embeddings(rnd, m=80, dim=64):
    vecs, labels = [], []
    for i in range(m):
        if i % 19 == 5:
            v = [0.0] * dim                          # zero vector -> NaN cosine
        else:
            v = [rnd.uniform(-1, 1) for _ in range(dim)]
        vecs.append(v)
        labels.append(rnd.randint(0, 4))
    for i in range(0, m, 13):                        # duplicates
        vecs[(i + 1) % m] = list(vecs[i])
    for i in range(0, m, 11):                        # near-dups
        vecs[(i + 2) % m] = [x + 0.001 for x in vecs[i]]
    return pa.table({
        "vec_id": pa.array(range(m), pa.int64()),
        "embedding": pa.array([[float(x) for x in v] for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32())})


def main():
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    work = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/graft_fuzz_{seed}"
    out = work + "_out"
    rnd = random.Random(seed)
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events"]:
        os.symlink(f"{FIXTURES}/{t}.parquet", f"{work}/{t}.parquet")
    pq.write_table(gen_documents(rnd), f"{work}/documents.parquet")
    pq.write_table(gen_embeddings(rnd), f"{work}/embeddings.parquet")
    subset = ",".join(DOC_QUERIES + EMB_QUERIES)
    env = dict(os.environ, SPARK_GRAFT_CPUS=os.environ.get("SPARK_GRAFT_CPUS", "8"))
    r = subprocess.run([f"{REPO}/tools/run.sh", "graft.Verify", work, out, subset],
                       env=env, capture_output=True, text=True)
    if r.returncode != 0:
        print(r.stdout[-2000:]); print(r.stderr[-3000:])
        print(f"FUZZ seed={seed}: Verify crashed rc={r.returncode}")
        return 1
    # surface per-query verify failures (they show as missing outputs below too)
    for line in r.stderr.splitlines():
        if "[verify]" in line:
            print(line)
    c = subprocess.run([sys.executable, f"{REPO}/tools/check.py", work, out],
                       capture_output=True, text=True)
    print(c.stdout)
    ok = c.returncode == 0
    print(f"FUZZ seed={seed}: {'CLEAN' if ok else 'DIVERGENCE FOUND'}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
