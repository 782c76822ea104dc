#!/usr/bin/env python3
"""Build a K-fold DISTINCT-document corpus for decade scaling probes.

The salted-copy corpus (SCALE.md round 3) is duplicate-SATURATED: every
doc gains K-1 near-identical siblings, so pair-emitting dedup output is
inherently quadratic in K — that corpus tests the df-caps. This builder
makes the complementary corpus: K copies that share ZERO character
5-grams with each other, while each copy keeps the original corpus's
INTERNAL near-duplicate structure. Candidate generation and pair output
should then scale ~linearly in K — the blocking-bound experiment for
dedup_ngram_jaccard and friends.

Construction: for copy i, insert the 2-char marker f"{i:02d}" after
every 3rd character of the text. The repeat period is 5 (3 original + 2
marker chars), so EVERY 5-char window contains both marker digits —
two copies with different markers share no window at all. (A first
attempt interleaved a marker TOKEN between words; word-internal 5-grams
survived unchanged, copy-variants of one doc collided in the min-gram
buckets at jaccard≈0.3 — below threshold, so all that candidate volume
was verify-and-discard work. The per-3-chars scheme closes that.)

Usage: build_distinct_corpus.py <src_dir> <out_dir> <K>
Writes out_dir/documents.parquet; symlinks every other table from src.
"""
import sys, os
import pyarrow as pa
import pyarrow.parquet as pq

src, out, k = sys.argv[1], sys.argv[2], int(sys.argv[3])
# K > 100 widens the marker to 3 digits: the repeat period is no longer 5,
# prefix-sharing markers ('10' vs '100') leak shared 5-grams across copies,
# and the zero-overlap guarantee silently breaks — refuse instead.
assert 1 <= k <= 100, f"K={k}: the 2-digit marker scheme only supports K <= 100"
os.makedirs(out, exist_ok=True)
t = pq.read_table(os.path.join(src, "documents.parquet"))
# the stride guard must bound the id DOMAIN, not the row count: a sparse
# corpus with ids above 10M would silently collide across copies.
# pyarrow.compute.max: no whole-column python-list copy, and None-safe
# (returns null only for an empty/all-null column, which fails the check)
_max_id = pa.compute.max(t.column("doc_id")).as_py()
assert _max_id is not None and _max_id < 10_000_000, \
    "doc_id domain too large for the 10M stride (or empty/all-null ids)"
n = t.num_rows
cols = t.column_names
writer = None
def mark(text, m):
    # insert m after every 3rd char: repeat period 5 means every 5-char
    # window contains both marker digits -> zero cross-copy gram overlap
    return m.join(text[j:j + 3] for j in range(0, len(text), 3))

for i in range(k):
    batch = t.to_pydict()
    marker = f"{i:02d}"
    batch["doc_id"] = [d + i * 10_000_000 for d in batch["doc_id"]]
    batch["text"] = [mark(x, marker) if x is not None else None
                     for x in batch["text"]]
    if "n_chars" in cols:  # keep the length metadata consistent
        batch["n_chars"] = [len(x) if x is not None else 0 for x in batch["text"]]
    tbl = pa.table(batch, schema=pa.schema(
        [(f.name, f.type) for f in t.schema]))
    if writer is None:
        writer = pq.ParquetWriter(os.path.join(out, "documents.parquet"), tbl.schema)
    writer.write_table(tbl)
writer.close()
for f in os.listdir(src):
    if f.endswith(".parquet") and f != "documents.parquet":
        dst = os.path.join(out, f)
        if not os.path.exists(dst):
            os.symlink(os.path.abspath(os.path.join(src, f)), dst)
print(f"wrote {out}/documents.parquet: {n} x {k} = {n*k} rows")
