#!/usr/bin/env python3
"""Build a K-fold SALTED-copy corpus for decade scaling probes.

The round-3 recipe, as a committed tool: K copies of `documents`, each
salted with one distinct trailing token (` zzsaltNN`), plus K perturbed
copies of `embeddings` (+i*1e-4 on component 0). Exact dedup does NOT
collapse the copies, the LSH family faces ~0.99-jaccard near-duplicates
at K× density, and cross-copy PARAGRAPHS (16-token windows away from the
tail) stay byte-identical — the duplicate-SATURATED corpus, deliberately
adversarial for pair-emitting and dup-set-broadcast operators. The
complementary zero-overlap corpus is build_distinct_corpus.py.

Usage: build_salted_corpus.py <src_dir> <out_dir> <K> [--docs-only]
Writes out_dir/documents.parquet + embeddings.parquet; symlinks every
other table from src. `--docs-only` symlinks embeddings unchanged
instead of perturbing K copies — the third-decade (K=1000) text probes
only read documents, and 5M perturbed vectors would cost minutes of
pure-Python list surgery for a table the probe never scans.
"""
import sys, os
import pyarrow as pa
import pyarrow.parquet as pq

src, out, k = sys.argv[1], sys.argv[2], int(sys.argv[3])
docs_only = "--docs-only" in sys.argv[4:]
assert 1 <= k <= 1000, f"K={k} outside the probe range"
os.makedirs(out, exist_ok=True)

t = pq.read_table(os.path.join(src, "documents.parquet"))
doc_ids = t.column("doc_id").to_pylist()
# null ids would crash the copy loop below with a bare TypeError; an empty
# corpus would crash the domain max — refuse both with a diagnostic
assert doc_ids and all(d is not None for d in doc_ids), \
    "documents.parquet must have a non-empty, non-null doc_id column"
# the stride guard must bound the id DOMAIN, not the row count: a sparse
# corpus with ids above 10M would silently collide across copies. The 10M
# stride is mirrored by graft.operators.Pretrain.SaltStride (the fixed
# eval-pool bound `doc_id < 10000000` means "base copy only" exactly
# because this assertion holds) — change them together.
assert max(doc_ids) < 10_000_000, "doc_id domain too large for the 10M stride"
texts = t.column("text").to_pylist()
others = {c: t.column(c).to_pylist() for c in t.column_names
          if c not in ("doc_id", "text")}
batches = []
for i in range(k):
    salt = f" zzsalt{i:02d}"
    salted = [None if x is None else x + salt for x in texts]
    cols = {
        "doc_id": pa.array([d + i * 10_000_000 for d in doc_ids], type=pa.int64()),
        "text": pa.array(salted),
    }
    for c, v in others.items():
        # n_chars is len(text) in the fixture; the salt grew the text, so
        # carrying the source value would leave metadata contradicting the
        # text (and any operator keying on n_chars off by the salt length)
        if c == "n_chars":
            v = [len(x) if x is not None else orig
                 for x, orig in zip(salted, v)]
        cols[c] = pa.array(v, type=t.schema.field(c).type)
    batches.append(pa.table({c: cols[c] for c in t.column_names}))
pq.write_table(pa.concat_tables(batches), os.path.join(out, "documents.parquet"))

if docs_only:
    # the loop excludes only documents.parquet, so it symlinks
    # embeddings.parquet along with every other table
    for f in os.listdir(src):
        if f.endswith(".parquet") and f != "documents.parquet":
            d2 = os.path.join(out, f)
            if not os.path.exists(d2):
                os.symlink(os.path.abspath(os.path.join(src, f)), d2)
    print(f"built {out}: K={k}, docs={t.num_rows * k}, vecs=symlinked")
    sys.exit(0)

e = pq.read_table(os.path.join(src, "embeddings.parquet"))
vec_ids = e.column("vec_id").to_pylist()
assert max(v for v in vec_ids if v is not None) < 10_000_000, \
    "vec_id domain too large for the 10M stride"
vecs = e.column("embedding").to_pylist()
eothers = {c: e.column(c).to_pylist() for c in e.column_names
           if c not in ("vec_id", "embedding")}
ebatches = []
for i in range(k):
    cols = {
        "vec_id": pa.array([v + i * 10_000_000 for v in vec_ids], type=pa.int64()),
        "embedding": pa.array(
            [None if v is None else [v[0] + i * 1e-4] + v[1:] for v in vecs],
            type=e.schema.field("embedding").type),
    }
    for c, v in eothers.items():
        cols[c] = pa.array(v, type=e.schema.field(c).type)
    ebatches.append(pa.table({c: cols[c] for c in e.column_names}))
pq.write_table(pa.concat_tables(ebatches), os.path.join(out, "embeddings.parquet"))

for f in os.listdir(src):
    if f.endswith(".parquet") and f not in ("documents.parquet", "embeddings.parquet"):
        dst = os.path.join(out, f)
        if not os.path.exists(dst):
            # abspath: a relative src would be resolved relative to
            # out_dir at link-FOLLOW time, leaving a broken link
            os.symlink(os.path.abspath(os.path.join(src, f)), dst)
print(f"built {out}: K={k}, docs={t.num_rows * k}, vecs={e.num_rows * k}")
