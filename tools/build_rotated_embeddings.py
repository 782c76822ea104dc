#!/usr/bin/env python3
"""Build a K-fold DECORRELATED embedding corpus for decade scaling probes.

The salted-copy corpus perturbs component 0 by i*1e-4, so every copy is a
~1.0-cosine near-duplicate of its source — duplicate-SATURATED, the
adversarial shape for the SRP band family (every bucket holds ~K copies
and candidate volume grows as K² per source vector). This builder makes
the complementary embedding corpus: copy i cyclically ROTATES the 64
components by i % 64 and NEGATES the vector on the second rotation period
(i >= 64), so no two copies of the same source vector are near-identical
(rotated float sequences decorrelate; the negated twin sits at cosine -1,
outside every radius). Candidate volume should then scale ~linearly in
K — the blocking-bound experiment for ann_range_search /
dedup_embedding_cosine, the embedding analog of build_distinct_corpus.

Usage: build_rotated_embeddings.py <src_dir> <out_dir> <K>
Writes out_dir/embeddings.parquet; symlinks every other table from src.
"""
import sys, os
import pyarrow as pa
import pyarrow.parquet as pq

src, out, k = sys.argv[1], sys.argv[2], int(sys.argv[3])
assert 1 <= k <= 128, f"K={k} outside the probe range (two rotation periods)"
os.makedirs(out, exist_ok=True)

t = pq.read_table(os.path.join(src, "embeddings.parquet"))
vec_ids = t.column("vec_id").to_pylist()
assert vec_ids and all(v is not None for v in vec_ids), \
    "embeddings.parquet must have a non-empty, non-null vec_id column"
assert max(vec_ids) < 10_000_000, "vec_id domain too large for the 10M stride"
embs = t.column("embedding").to_pylist()
labels = t.column("label").to_pylist()
batches = []
for i in range(k):
    r, neg = i % 64, i >= 64
    rot = [None if e is None else
           [(-x if neg and x is not None else x)
            for x in (e[r:] + e[:r])] for e in embs]
    batches.append(pa.table({
        "vec_id": pa.array([v + i * 10_000_000 for v in vec_ids], pa.int64()),
        "embedding": pa.array(rot, pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    }))
pq.write_table(pa.concat_tables(batches), os.path.join(out, "embeddings.parquet"))
for f in os.listdir(src):
    if f.endswith(".parquet") and f != "embeddings.parquet":
        dst = os.path.join(out, f)
        if not os.path.exists(dst):
            os.symlink(os.path.abspath(os.path.join(src, f)), dst)
print(f"built {out}: K={k}, vecs={len(vec_ids) * k}")
