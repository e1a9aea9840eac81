"""Training-data pipelines over the driver test tables: deduplication
(exact, MinHash-LSH, SimHash, n-gram Jaccard, embedding-cosine),
approximate nearest neighbour, and text analysis.

Scale shapes (the 100 TB story):
- sketches (minhash/simhash signatures) are computed per batch in
  map_batches, exploded to (bucket_key, doc_id) rows, and candidate
  generation is a groupby on the bucket key — the only shuffle moves
  signature rows, never documents;
- candidate verification re-reads only the candidate texts (here: a
  broadcast dict, at scale: a hash-join against the docs table);
- brute-force ANN broadcasts the query matrix once (ray.put) and each
  batch does one numpy matmul + local top-k, reduced to a global top-k.

Near-dup pipelines accept an ``augment`` flag that unions deterministic
perturbed copies into the input so tests can assert planted duplicates
are found (the raw test tables have no duplicates).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions import dedup as dd
from ..functions import textstats as ts

AUG_OFFSET = 1_000_000


def _read(sf_dir: str, name: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{name}.parquet", columns=columns)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def dedup_exact(sf_dir: str) -> pd.DataFrame:
    """Exact dedup: keep min(doc_id) per identical text.  Input is
    documents ∪ exact copies (doc_id+AUG_OFFSET for doc_id%3==0) — the
    same augmentation the oracle SQL applies.  Scale shape: fingerprint
    per batch (vectorized), groupby(fingerprint) keeps first."""
    import ray.data as rd

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def aug_fp(t: pa.Table) -> pa.Table:
        # one Arrow stage: fingerprint originals, then append the %3==0
        # copies REUSING their fingerprints (the augmentation is an exact
        # copy, so fp(copy) == fp(original) — the duplicated text never
        # exists, and the Arrow->pandas round trip is gone)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        fps = ts.fingerprint_batch(t["text"].to_pylist()).astype(np.uint64)
        m = ids % 3 == 0
        return pa.table(
            {
                "doc_id": np.concatenate([ids, ids[m] + AUG_OFFSET]),
                "fp": np.concatenate([fps, fps[m]]),
            }
        )

    ds = ds.map_batches(aug_fp, batch_format="pyarrow")

    # vectorized group-min (relational.group_agg): fingerprints are
    # ~unique per document, so Ray Data's groupby().aggregate() would hit
    # its per-group Python reduce (~2-4 ms/group — CLAUDE.md invariant 7)
    from .relational import group_agg

    out = group_agg(ds, ["fp"], {"doc_id": ("doc_id", "min")})
    out["doc_id"] = out["doc_id"].astype("int64")
    return out[["doc_id"]].sort_values("doc_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# near-dup: MinHash + LSH
# ---------------------------------------------------------------------------


def _perturb(text: str, doc_id: int) -> str:
    """Deterministic small perturbation: replace every 11th token."""
    toks = text.split()
    for i in range(doc_id % 11, len(toks), 11):
        toks[i] = "tok" + str((doc_id + i) % 97)
    return " ".join(toks)


def _augmented_docs(sf_dir: str, frac_mod: int = 4):
    """documents ∪ near-dup copies of doc_id % frac_mod == 0."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def aug(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        m = ids % frac_mod == 0
        cids = ids[m]
        ctexts = t.filter(pa.array(m))["text"].to_pylist()
        copies = pa.table(
            {
                "doc_id": pa.array(cids + AUG_OFFSET, t["doc_id"].type),
                "text": pa.array(
                    [_perturb(tx, int(d)) for tx, d in zip(ctexts, cids)],
                    t["text"].type,
                ),
            }
        )
        return pa.concat_tables([t.select(["doc_id", "text"]), copies])

    return ds.map_batches(aug, batch_format="pyarrow")


def minhash_lsh_dedup(
    sf_dir: str,
    num_perm: int = 64,
    bands: int = 32,
    threshold: float = 0.4,
    sig_batch: int = 256,
) -> pd.DataFrame:
    """MinHash+LSH near-dup pairs: shingle→minhash→band→bucket-groupby→
    signature-Jaccard verify.  Returns (doc_a, doc_b, jaccard) pairs."""
    ds = _augmented_docs(sf_dir)

    # shuffle on a bounded bucket-hash partition key (not per-bucket
    # map_groups: millions of tiny LSH buckets would pay per-group
    # overhead; each partition does one local pandas groupby)
    nparts = _n_bucket_parts()
    step = 8 * num_perm

    def sigs(t: pa.Table) -> pa.Table:
        flat, lens = dd.token_hashes(t["text"].to_pylist())
        sh, sh_lens = dd.shingle_hashes(flat, lens)
        sig = dd.minhash_signatures(sh, sh_lens, num_perm=num_perm)
        keys = dd.lsh_band_keys(sig, bands=bands)
        # signatures travel the shuffle as ONE fixed-size-binary cell per
        # row (zero-copy from the repeated uint64 matrix; an object
        # column of numpy arrays costs a pickle per element and was the
        # minhash shuffle's hot spot); bpart rides along from the same
        # pass — no second map_batches over the exploded rows
        rep = np.repeat(sig.astype("<u8", copy=False), bands, axis=0)
        sig_col = pa.FixedSizeBinaryArray.from_buffers(
            pa.binary(step), rep.shape[0], [None, pa.py_buffer(rep.tobytes())]
        )
        buckets = keys.ravel().astype(np.int64, copy=False)
        return pa.table(
            {
                "doc_id": np.repeat(
                    t["doc_id"].to_numpy(zero_copy_only=False), bands
                ),
                "bucket": buckets,
                "sig": sig_col,
                "bpart": buckets % nparts,
            }
        )

    # sig_batch: the sig stage is CPU-per-doc-heavy, so batch_size sets
    # its task granularity — at fixture scale (one input block) 256
    # rows/task keeps all cores busy (measured 2.5 s -> 1.4 s vs 2048;
    # 128 regresses on per-call overhead); at corpus scale the input
    # block count itself provides the parallelism
    exploded = ds.map_batches(sigs, batch_format="pyarrow", batch_size=sig_batch)

    def pairs_part(g: pd.DataFrame) -> pd.DataFrame:
        # array-valued pair emission (see simhash pairs_part)
        a_parts, b_parts, j_parts = [], [], []
        for _, grp in g.groupby("bucket", sort=True):
            if len(grp) < 2:
                continue
            ids = grp["doc_id"].to_numpy()
            sigm = np.frombuffer(b"".join(grp["sig"]), dtype="<u8").reshape(
                len(grp), -1
            )
            order = np.argsort(ids, kind="stable")
            ids, sigm = ids[order], sigm[order]
            for i in range(len(ids) - 1):
                eq = (sigm[i + 1 :] == sigm[i]).mean(axis=1)
                m = (eq >= threshold) & (ids[i + 1 :] != ids[i])
                if m.any():
                    b = ids[i + 1 :][m]
                    a_parts.append(np.full(b.size, ids[i], dtype=np.int64))
                    b_parts.append(b)
                    j_parts.append(np.round(eq[m], 4))
        if not a_parts:
            return pd.DataFrame(
                {"doc_a": pd.Series([], dtype="int64"),
                 "doc_b": pd.Series([], dtype="int64"),
                 "jaccard": pd.Series([], dtype="float64")}
            )
        return pd.DataFrame(
            {
                "doc_a": np.concatenate(a_parts),
                "doc_b": np.concatenate(b_parts).astype(np.int64),
                "jaccard": np.concatenate(j_parts).astype(np.float64),
            }
        )

    cand = exploded.groupby("bpart").map_groups(pairs_part, batch_format="pandas").to_pandas()
    cand = cand.drop_duplicates(["doc_a", "doc_b"])
    return cand.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def ngram_jaccard_pairs(sf_dir: str, threshold: float = 0.4) -> pd.DataFrame:
    """Exact n-gram Jaccard verification of LSH candidates (the
    verify-after-sketch stage).  Scale shape: candidate pairs are
    hash-joined against the documents table twice (doc_a side, doc_b
    side) — only candidate texts move, the corpus is never broadcast."""
    import ray.data as rd

    cand = minhash_lsh_dedup(sf_dir, threshold=0.3)
    if cand.empty:
        return pd.DataFrame({"doc_a": [], "doc_b": [], "jaccard": []})
    docs = _augmented_docs(sf_dir)
    cand_ds = rd.from_pandas(cand[["doc_a", "doc_b"]])
    nparts = 8
    j1 = cand_ds.join(
        docs, "inner", nparts, on=("doc_a",), right_on=("doc_id",)
    ).map_batches(
        lambda df: df.rename(columns={"text": "text_a"})[["doc_a", "doc_b", "text_a"]],
        batch_format="pandas",
    )
    j2 = j1.join(
        _augmented_docs(sf_dir), "inner", nparts, on=("doc_b",), right_on=("doc_id",)
    )

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        jac = [
            dd.exact_jaccard(a, b) for a, b in zip(df["text_a"], df["text"])
        ]
        out = df[["doc_a", "doc_b"]].assign(
            jaccard=np.round(np.asarray(jac, dtype=np.float64), 6)
        )
        return out[np.asarray(jac) >= threshold]

    out = j2.map_batches(verify, batch_format="pandas").to_pandas()
    out = out.astype({"doc_a": "int64", "doc_b": "int64", "jaccard": "float64"})
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def simhash_dedup(sf_dir: str, max_hamming: int = 8) -> pd.DataFrame:
    """SimHash near-dup pairs via chunk-banding (pigeonhole) + hamming
    verify."""
    ds = _augmented_docs(sf_dir)
    bands = 4

    nparts = _n_bucket_parts()

    def sigs(t: pa.Table) -> pa.Table:
        flat, lens = dd.token_hashes(t["text"].to_pylist())
        sh = dd.simhash(flat, lens)
        keys = dd.simhash_band_keys(sh, bands=bands)
        buckets = keys.ravel().astype(np.int64, copy=False)
        return pa.table(
            {
                "doc_id": np.repeat(
                    t["doc_id"].to_numpy(zero_copy_only=False), bands
                ),
                "bucket": buckets,
                "sh": np.repeat(sh, bands),
                "bpart": buckets % nparts,
            }
        )

    # 256 rows/task: same task-granularity reasoning as the minhash sig
    # stage (the tokenize+simhash kernel dominates per row)
    exploded = ds.map_batches(sigs, batch_format="pyarrow", batch_size=256)

    def pairs_part(g: pd.DataFrame) -> pd.DataFrame:
        # pair emission is fully array-valued: per anchor row i the
        # surviving (i, j>i) pairs append as numpy slices, never as
        # per-pair Python tuples (a bucket family can emit 10^5+ pairs)
        a_parts, b_parts, h_parts = [], [], []
        for _, grp in g.groupby("bucket", sort=True):
            if len(grp) < 2:
                continue
            grp = grp.sort_values("doc_id")
            ids = grp["doc_id"].to_numpy()
            sh = grp["sh"].to_numpy().astype(np.uint64)
            for i in range(len(ids) - 1):
                hd = dd.hamming64(
                    np.full(len(ids) - i - 1, sh[i], dtype=np.uint64), sh[i + 1 :]
                )
                m = (hd <= max_hamming) & (ids[i + 1 :] != ids[i])
                if m.any():
                    b = ids[i + 1 :][m]
                    a_parts.append(np.full(b.size, ids[i], dtype=np.int64))
                    b_parts.append(b)
                    h_parts.append(hd[m])
        if not a_parts:
            return pd.DataFrame(
                {"doc_a": pd.Series([], dtype="int64"),
                 "doc_b": pd.Series([], dtype="int64"),
                 "hamming": pd.Series([], dtype="int64")}
            )
        return pd.DataFrame(
            {
                "doc_a": np.concatenate(a_parts),
                "doc_b": np.concatenate(b_parts).astype(np.int64),
                "hamming": np.concatenate(h_parts).astype(np.int64),
            }
        )

    out = exploded.groupby("bpart").map_groups(pairs_part, batch_format="pandas").to_pandas()
    out = out.drop_duplicates(["doc_a", "doc_b"])
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# embeddings: ANN + cosine near-dup
# ---------------------------------------------------------------------------


def stack_embeddings(col) -> np.ndarray:
    """Arrow list<float> column → (n, dim) ndarray via one flatten+reshape
    (no per-row Python objects; zero-copy when the buffer allows)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    flat = arr.flatten().to_numpy(zero_copy_only=False)
    return flat.reshape(len(arr), -1)


def ann_topk(sf_dir: str, n_queries: int = 10, k: int = 10) -> pd.DataFrame:
    """Brute-force cosine top-k: broadcast query matrix, per-batch matmul
    + local top-k over ROUNDED scores (all k-th-score ties kept so the
    global re-sort sees every row the SQL QUALIFY would), global re-sort.
    Scores are float64 to match the DOUBLE-cast DuckDB oracle."""
    import ray

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    qt = pa.concat_tables(
        ds.map_batches(
            lambda t: t.filter(pa.compute.less(t["vec_id"], n_queries)),
            batch_format="pyarrow",
        ).iter_batches(batch_format="pyarrow")
    )
    Q = stack_embeddings(qt["embedding"]).astype(np.float64)
    qids = qt["vec_id"].to_numpy()
    ref = ray.put((qids, Q))

    def topk_batch(t: pa.Table) -> pd.DataFrame:
        qids, Q = ray.get(ref)
        V = stack_embeddings(t["embedding"]).astype(np.float64)
        ids = t["vec_id"].to_numpy()
        qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
        vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
        sims_r = np.round(qn @ vn.T, 6)  # (Q, N) rounded BEFORE selection
        kk = min(k, sims_r.shape[1])
        kth = -np.partition(-sims_r, kk - 1, axis=1)[:, kk - 1]
        qi, vi = np.nonzero(sims_r >= kth[:, None])  # keeps k-th-score ties
        return pd.DataFrame(
            {"query_id": qids[qi], "vec_id": ids[vi], "score": sims_r[qi, vi]}
        )

    parts = ds.map_batches(topk_batch, batch_format="pyarrow", batch_size=4096).to_pandas()
    parts = parts.sort_values(
        ["query_id", "score", "vec_id"], ascending=[True, False, True]
    )
    out = parts.groupby("query_id", as_index=False).head(k)
    return out[["query_id", "vec_id", "score"]].reset_index(drop=True)


def _n_bucket_parts() -> int:
    """Bucket-hash shuffle width for the near-dup stages: scale with
    the cluster (4 partitions per CPU, floor 64) instead of a fixed
    constant — at 256 nodes a 64-way shuffle would leave most of the
    cluster idle; results are partition-count-invariant because pairs
    are computed per FULL bucket key inside each partition."""
    try:
        import ray

        if ray.is_initialized():
            return max(64, int(ray.cluster_resources().get("CPU", 16)) * 4)
    except Exception:
        pass
    return 64


def _mix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer — a deterministic uniform-ish
    64-bit mix of integer ids, used for count-bounded sampling."""
    z = x.astype(np.uint64, copy=True)
    z += np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def ann_topk_ivf(
    sf_dir: str,
    n_queries: int = 10,
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 12,
    train_cap: int = 4096,
) -> pd.DataFrame:
    """IVF (inverted-file) approximate top-k — the scale path for
    similarity search: a coarse k-means quantizer trained on a bounded
    COUNT sample, then each batch scores only against queries probing
    its cells.  At 100 TB the assign stage partitions vectors by cell
    (write-partitioned parquet) and queries touch nprobe/n_cells of the
    data; here cells are pruned per batch.  Deterministic (seeded init,
    fixed Lloyd iterations).  Rows-only check (approximate by design);
    recall vs brute force is pinned in tests.

    The training sample is bounded by ``train_cap`` ROWS independent of
    input size (the r4 verdict's fix; the old form pulled a fixed 25%
    FRACTION onto the driver — a driver OOM at 100 TB): a splitmix64
    hash of vec_id is thresholded at ~1.5×cap/N in expectation (N from
    parquet metadata, no scan), then the cap smallest-hash rows are
    kept — an order-independent, deterministic top-K by hash, so the
    quantizer does not depend on block arrival order.

    Default nprobe is high (12/16) because the synthetic embeddings'
    clusters are broad — measured recall@10 vs nprobe on the fixture:
    4→0.57, 8→0.74, 12→0.92.  On tightly clustered real embeddings the
    usual nprobe/n_cells ≈ 0.1 applies; the per-batch cell-pruning
    machinery is identical either way."""
    import ray

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    # 1) train the coarse quantizer on a count-bounded hash-sample.
    # Threshold pass: keep rows whose mixed hash < 1.5*cap/N of the
    # hash space (in expectation ~1.5*cap rows survive; each batch
    # also hard-caps its own contribution, so the driver concat is
    # O(cap + n_batches) rows, not O(N)).
    n_total = max(ds.count(), 1)
    frac = min(1.0, 1.5 * train_cap / n_total)
    thresh = np.uint64(min(int(frac * float(2**64 - 1)), 2**64 - 1))

    def train_filter(t: pa.Table) -> pa.Table:
        h = _mix64(t["vec_id"].to_numpy())
        idx = np.nonzero(h < thresh)[0]
        if len(idx) > train_cap:  # per-batch hard cap
            idx = idx[np.argsort(h[idx], kind="stable")[:train_cap]]
        return t.take(pa.array(idx))

    sample = pa.concat_tables(
        ds.map_batches(train_filter, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    )
    # global top-cap by (hash, vec_id): deterministic regardless of
    # Ray block arrival order (preserve_order off)
    s_ids = sample["vec_id"].to_numpy()
    s_h = _mix64(s_ids)
    s_order = np.lexsort((s_ids, s_h))[:train_cap]
    S = stack_embeddings(sample["embedding"]).astype(np.float64)[s_order]
    Sn = S / np.maximum(np.linalg.norm(S, axis=1, keepdims=True), 1e-12)
    rng = np.random.Generator(np.random.PCG64(23))
    C = Sn[rng.choice(len(Sn), size=min(n_cells, len(Sn)), replace=False)]
    for _ in range(5):  # Lloyd iterations on the sample (cosine metric)
        Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
        assign = (Sn @ Cn.T).argmax(axis=1)
        for c in range(len(C)):
            m = assign == c
            if m.any():
                C[c] = Sn[m].mean(axis=0)
    C = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)

    # 2) queries + their probe cells, broadcast once
    qt = pa.concat_tables(
        ds.map_batches(
            lambda t: t.filter(pa.compute.less(t["vec_id"], n_queries)),
            batch_format="pyarrow",
        ).iter_batches(batch_format="pyarrow")
    )
    q_order = np.argsort(qt["vec_id"].to_numpy(), kind="stable")
    Q = stack_embeddings(qt["embedding"]).astype(np.float64)[q_order]
    Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
    qids = qt["vec_id"].to_numpy()[q_order]
    probes = np.argsort(-(Qn @ C.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    ref = ray.put((qids, Qn, C, probes))

    # 3) per-batch: assign vectors to cells, score each cell's vectors
    # against only the queries probing that cell, local top-k
    def scored(t: pa.Table) -> pd.DataFrame:
        qids, Qn, C, probes = ray.get(ref)
        V = stack_embeddings(t["embedding"]).astype(np.float64)
        Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
        ids = t["vec_id"].to_numpy()
        cell = (Vn @ C.T).argmax(axis=1)
        out_q, out_v, out_s = [], [], []
        for c in np.unique(cell):
            qi = np.nonzero((probes == c).any(axis=1))[0]
            if not len(qi):
                continue
            vi = np.nonzero(cell == c)[0]
            sims = np.round(Qn[qi] @ Vn[vi].T, 6)  # (nq_c, nv_c)
            kk = min(k, sims.shape[1])
            kth = -np.partition(-sims, kk - 1, axis=1)[:, kk - 1]
            a, b = np.nonzero(sims >= kth[:, None])
            out_q.append(qids[qi[a]])
            out_v.append(ids[vi[b]])
            out_s.append(sims[a, b])
        if not out_q:
            return pd.DataFrame(
                {"query_id": pd.Series([], dtype="int64"),
                 "vec_id": pd.Series([], dtype="int64"),
                 "score": pd.Series([], dtype="float64")}
            )
        return pd.DataFrame(
            {
                "query_id": np.concatenate(out_q),
                "vec_id": np.concatenate(out_v),
                "score": np.concatenate(out_s),
            }
        )

    parts = ds.map_batches(scored, batch_format="pyarrow", batch_size=4096).to_pandas()
    parts = parts.sort_values(
        ["query_id", "score", "vec_id"], ascending=[True, False, True]
    )
    out = parts.groupby("query_id", as_index=False).head(k)
    return out[["query_id", "vec_id", "score"]].reset_index(drop=True)


from functools import lru_cache


@lru_cache(maxsize=8)
def _hyperplanes(dim: int, nbits: int, seed: int = 11) -> np.ndarray:
    """Deterministic random hyperplanes for sign-bit embedding LSH
    (computed once per worker process)."""
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.normal(size=(nbits, dim))


def _aug_embeddings(sf_dir: str):
    """embeddings ∪ noisy copies of vec_id % 5 == 0 (arrow-native)."""
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def aug(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy()
        sel = np.nonzero(ids % 5 == 0)[0]
        V = stack_embeddings(t["embedding"])[sel].astype(np.float64)
        # deterministic affine perturbation (cosine ≈ 0.9967 at dim 64),
        # chosen to be SQL-expressible so the oracle twin can rebuild the
        # planted copies exactly (list_transform(x -> x*0.98 + 0.01))
        new = (V * 0.98 + 0.01).astype(np.float32)
        emb_type = t.schema.field("embedding").type
        dim = new.shape[1] if len(sel) else 0
        offs = np.arange(0, (len(sel) + 1) * dim, dim, dtype=np.int64) if dim else np.zeros(len(sel) + 1, np.int64)
        new_emb = pa.ListArray.from_arrays(
            pa.array(offs, pa.int32()), pa.array(new.ravel(), emb_type.value_type)
        ).cast(emb_type)
        copies = pa.table(
            {
                "vec_id": pa.array(ids[sel] + AUG_OFFSET, t.schema.field("vec_id").type),
                "embedding": new_emb,
            }
        )
        return pa.concat_tables([t.select(["vec_id", "embedding"]), copies])

    return ds.map_batches(aug, batch_format="pyarrow")


def embedding_near_dup(
    sf_dir: str, threshold: float = 0.95, bands: int = 8, band_bits: int = 8
) -> pd.DataFrame:
    """Embedding-cosine near-dup via random-hyperplane LSH: sign-bit
    signatures → banded buckets (the same bounded-shuffle shape as
    minhash_lsh_dedup) → exact cosine verify inside each bucket.  Only
    (bucket, vec_id, embedding) rows shuffle — the matrix is never
    broadcast and no stage is O(N²).  Recall for a pair at cosine c is
    1-(1-p^band_bits)^bands with p = 1 - arccos(c)/π (≈0.99 at c=0.95
    for 8×8; planted near-dups at c≈0.997 are found w.p. ~1)."""
    nbits = bands * band_bits
    nparts = _n_bucket_parts()

    def sig(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy()
        n = len(ids)
        V = stack_embeddings(t["embedding"]).astype(np.float64)
        H = _hyperplanes(V.shape[1], nbits)
        bits = (V @ H.T) > 0  # (n, nbits)
        keys = np.empty((n, bands), dtype=np.uint64)
        for b in range(bands):
            chunk = bits[:, b * band_bits : (b + 1) * band_bits]
            val = chunk @ (1 << np.arange(band_bits, dtype=np.uint64))
            keys[:, b] = val | np.uint64(b << band_bits)  # band-salted
        idx = np.repeat(np.arange(n), bands)
        return pa.table(
            {
                "bucket": pa.array(keys.ravel(), pa.uint64()),
                "bpart": pa.array((keys.ravel() % nparts).astype(np.int64)),
                "vec_id": pa.array(ids[idx]),
                "embedding": t["embedding"].take(idx),
            }
        )

    exploded = _aug_embeddings(sf_dir).map_batches(
        sig, batch_format="pyarrow", batch_size=4096
    )

    def pairs_part(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for _, grp in g.groupby("bucket", sort=True):
            if len(grp) < 2:
                continue
            ids = grp["vec_id"].to_numpy()
            order = np.argsort(ids, kind="stable")
            ids = ids[order]
            V = np.stack(grp["embedding"].to_numpy())[order].astype(np.float64)
            Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
            S = Vn @ Vn.T
            iu, ju = np.triu_indices(len(ids), 1)
            hit = S[iu, ju] >= threshold
            for i, j in zip(iu[hit], ju[hit]):
                if ids[i] != ids[j]:
                    rows.append((int(ids[i]), int(ids[j]), round(float(S[i, j]), 4)))
        return pd.DataFrame(rows, columns=["vec_a", "vec_b", "cosine"]).astype(
            {"vec_a": "int64", "vec_b": "int64", "cosine": "float64"}
        )

    out = (
        exploded.groupby("bpart").map_groups(pairs_part, batch_format="pandas").to_pandas()
    )
    out = out.drop_duplicates(["vec_a", "vec_b"])
    return out.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# oracle-checkable planted-duplicate verification (the hash-checked faces
# of the sketch pipelines: the full LSH machinery runs, the registered
# result is the planted-pair subset with an EXACT similarity column that
# DuckDB recomputes independently from the base tables)
# ---------------------------------------------------------------------------


CC_DRIVER_EDGE_MAX = 1 << 20  # union-find on the driver below this


def _cc_route(vals: np.ndarray, payloads: tuple, P: int) -> list:
    """Split parallel arrays into P per-bucket tuples by vals % P."""
    tb = vals % P
    order = np.argsort(tb, kind="stable")
    cuts = np.searchsorted(tb[order], np.arange(P + 1))
    sorted_payloads = tuple(p[order] for p in payloads)
    return [
        tuple(p[cuts[t] : cuts[t + 1]] for p in sorted_payloads)
        for t in range(P)
    ]


def _cc_edge_task(P: int, edges: dict, labels: dict, *jump_blobs):
    """Bucket-q propose task: join this bucket's label table against the
    static edges keyed here (key = neighbor id in bucket q) plus the
    round's pointer-jump requests (key = some node's current label, also
    owned by q); emit (dst, label[key]) proposals routed by dst bucket.
    Proposals with label >= dst are pruned: label[dst] <= dst always
    (labels start at own id, only decrease), so they cannot win."""
    node, lab = labels["node"], labels["label"]
    key, dst = edges["nbr"], edges["dst"]
    live = [j for j in jump_blobs if j is not None and len(j[0])]
    if live:
        key = np.concatenate([key] + [j[0] for j in live])
        dst = np.concatenate([dst] + [j[1] for j in live])
    idx = np.searchsorted(node, key)
    plab = lab[idx]
    m = plab < dst
    dst, plab = dst[m], plab[m]
    return tuple(_cc_route(dst, (dst, plab), P))


def _cc_owner_task(P: int, labels: dict, *prop_blobs):
    """Bucket-p combine task: min-merge the round's proposals into this
    bucket's labels, then emit next-round pointer-jump requests
    (label[x], x) for every non-root node — the receiving bucket owns
    label[x] and will propose label[label[x]] back, halving chain depth
    per round (pointer jumping / path doubling).  Returns the new label
    table, P jump blobs, and the changed count (the driver's scalar
    convergence test)."""
    node, lab = labels["node"], labels["label"].copy()
    changed = 0
    live = [p for p in prop_blobs if p is not None and len(p[0])]
    if live:
        dst = np.concatenate([p[0] for p in live])
        plab = np.concatenate([p[1] for p in live])
        idx = np.searchsorted(node, dst)
        o = np.lexsort((plab, idx))
        idx_s, plab_s = idx[o], plab[o]
        first = np.ones(len(idx_s), dtype=bool)
        first[1:] = idx_s[1:] != idx_s[:-1]
        tgt = idx_s[first]
        lab[tgt] = np.minimum(lab[tgt], plab_s[first])
        changed = int((lab != labels["label"]).sum())
    m = lab != node
    jumps = _cc_route(lab[m], (lab[m], node[m]), P)
    return tuple(
        [{"node": node, "label": lab}] + jumps + [changed]
    )


def cc_min_label_rounds(
    pairs: pd.DataFrame, n_buckets: int = 64, max_rounds: int = 64
) -> pd.DataFrame:
    """Distributed connected components over a near-dup edge list:
    iterated min-label rounds over hash buckets (the map-reduce CC
    standard) with pointer jumping, so rounds are O(log max-cluster-
    diameter).  Each round is two waves of P raw Ray tasks — propose
    (static edges + jump requests joined against the owning bucket's
    labels) and combine (vectorized min per node) — exchanging only
    per-bucket numpy blobs; nothing but a changed-count scalar lands on
    the driver per round.  Raw tasks rather than Ray Data because an
    iterative fixpoint pays the per-pipeline fixed cost every round
    (CLAUDE.md invariant 7: Dataset groupby's sort shuffle costs seconds
    per round regardless of row count); static edge partitions are
    ``ray.put`` once and shared across all rounds.

    Returns (doc_id, group_id) sorted by doc_id, identical to the
    driver-side union-find (pinned in tests/test_training.py)."""
    import ray

    P = n_buckets
    a = pairs["doc_a"].to_numpy(dtype=np.int64)
    b = pairs["doc_b"].to_numpy(dtype=np.int64)
    node = np.concatenate([a, b])
    nbr = np.concatenate([b, a])
    nodes = np.unique(node)
    # static edge partitions keyed by NEIGHBOR bucket; label partitions
    # by node bucket, node-sorted so the join is a searchsorted
    eb = nbr % P
    edge_refs = []
    for q in range(P):
        m = eb == q
        o = np.argsort(nbr[m], kind="stable")
        edge_refs.append(
            ray.put({"nbr": nbr[m][o], "dst": node[m][o]})
        )
    lb = nodes % P
    label_refs = [
        ray.put({"node": nodes[lb == p], "label": nodes[lb == p].copy()})
        for p in range(P)
    ]

    edge_task = ray.remote(_cc_edge_task).options(num_returns=P)
    owner_task = ray.remote(_cc_owner_task).options(num_returns=P + 2)
    # round 0 has no jump requests (labels are self)
    jump_refs = [[None] * P for _ in range(P)]  # [src_bucket][target]
    for _ in range(max_rounds):
        props = [
            edge_task.remote(
                P,
                edge_refs[q],
                label_refs[q],
                *[jump_refs[p][q] for p in range(P)],
            )
            for q in range(P)
        ]
        if P == 1:
            props = [[r] for r in props]
        owners = [
            owner_task.remote(
                P, label_refs[p], *[props[q][p] for q in range(P)]
            )
            for p in range(P)
        ]
        label_refs = [o[0] for o in owners]
        jump_refs = [list(o[1 : P + 1]) for o in owners]
        if sum(ray.get([o[P + 1] for o in owners])) == 0:
            break
    parts = ray.get(label_refs)
    out = pd.DataFrame(
        {
            "doc_id": np.concatenate([p["node"] for p in parts]),
            "group_id": np.concatenate([p["label"] for p in parts]),
        }
    )
    return out.sort_values("doc_id").reset_index(drop=True)


def dedup_groups(
    sf_dir: str,
    threshold: float = 0.4,
    driver_edge_max: int = CC_DRIVER_EDGE_MAX,
) -> pd.DataFrame:
    """Near-dup clustering: connected components over the exact-Jaccard
    pair graph, labeling every document in a dup cluster with the
    cluster's minimum doc_id (the canonical representative a training
    pipeline would keep).  Returns (doc_id, group_id) for clustered
    docs only — singletons are implicit.

    Scale shape: the pair edges come from the bounded LSH-bucket
    pipeline (only candidate signatures shuffle).  Components form via
    union-find on the driver while the edge list is small
    (≤ ``driver_edge_max``); above that, :func:`cc_min_label_rounds`
    runs the iterated min-label hash-join rounds distributed — same
    result, pinned equal in tests.
    """
    pairs = ngram_jaccard_pairs(sf_dir, threshold=threshold)
    if pairs.empty:
        return pd.DataFrame({"doc_id": [], "group_id": []}).astype(
            {"doc_id": "int64", "group_id": "int64"}
        )
    if len(pairs) > driver_edge_max:
        return cc_min_label_rounds(pairs)
    a = pairs["doc_a"].to_numpy(dtype=np.int64)
    b = pairs["doc_b"].to_numpy(dtype=np.int64)
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for x, y in zip(a.tolist(), b.tolist()):
        rx, ry = find(x), find(y)
        if rx != ry:
            if rx < ry:  # min-root union → root IS the canonical min
                parent[ry] = rx
            else:
                parent[rx] = ry
    nodes = sorted(set(a.tolist()) | set(b.tolist()))
    out = pd.DataFrame(
        {"doc_id": nodes, "group_id": [find(n) for n in nodes]}
    ).astype({"doc_id": "int64", "group_id": "int64"})
    return out.sort_values("doc_id").reset_index(drop=True)


def minhash_planted_verify(sf_dir: str) -> pd.DataFrame:
    """MinHash-LSH near-dup detection, verified on the planted dups:
    runs the full sketch pipeline (shingle→minhash→band→bucket shuffle),
    keeps the planted pairs it found, and attaches the EXACT word-shingle
    Jaccard recomputed from the original text + the deterministic
    perturbation.  The oracle twin rebuilds the same pairs and values in
    SQL, so a single missed planted pair (LSH recall < 1) or a wrong
    jaccard hash-fails."""
    import ray.data as rd

    pairs = minhash_lsh_dedup(sf_dir, threshold=0.3)
    planted = pairs[
        ((pairs["doc_b"] - pairs["doc_a"]) == AUG_OFFSET)
        & (pairs["doc_a"] % 4 == 0)
    ][["doc_a", "doc_b"]]
    if planted.empty:
        return pd.DataFrame({"doc_a": [], "doc_b": [], "jaccard": []})
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    j = rd.from_pandas(planted).join(
        docs, "inner", 8, on=("doc_a",), right_on=("doc_id",)
    )

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        jac = [
            round(dd.exact_jaccard(t, _perturb(t, int(d))), 6)
            for t, d in zip(df["text"], df["doc_a"])
        ]
        return df[["doc_a", "doc_b"]].assign(jaccard=jac)

    out = j.map_batches(verify, batch_format="pandas").to_pandas()
    out = out.astype({"doc_a": "int64", "doc_b": "int64", "jaccard": "float64"})
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def simhash_planted_verify(sf_dir: str) -> pd.DataFrame:
    """SimHash kernel pinned bit-exact: the registered face is the
    hamming distance between every planted doc (doc_id % 4 == 0) and its
    deterministic perturbation, computed with the production kernels
    (token rolling-hash → per-bit majority vote → popcount,
    functions/dedup.py) inside map_batches.  The DuckDB oracle
    recomputes the token hashes, the 64 majority votes, the packed
    signature and the popcount independently in SQL — one flipped bit
    anywhere hash-fails.  The pigeonhole-banded pair mining stays
    covered by :func:`simhash_dedup` (rows-only) and the planted-recall
    pytest; banding recall at hamming ≤ 8 with 4×16-bit bands is
    intentionally partial (pigeonhole only guarantees hd < bands), so a
    found-pair face would not be oracle-stable."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def f(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["doc_id"] % 4 == 0]
        texts = df["text"].tolist()
        pert = [_perturb(t, int(d)) for t, d in zip(texts, df["doc_id"])]
        fa, la = dd.token_hashes(texts)
        sa = dd.simhash(fa, la)
        fb, lb = dd.token_hashes(pert)
        sb = dd.simhash(fb, lb)
        hd = dd.hamming64(sa.astype(np.uint64), sb.astype(np.uint64))
        return pd.DataFrame(
            {
                "doc_a": df["doc_id"].astype("int64"),
                "doc_b": df["doc_id"].astype("int64") + AUG_OFFSET,
                "hamming": hd.astype("int64"),
            }
        )

    out = ds.map_batches(f, batch_format="pandas").to_pandas()
    return out.sort_values("doc_a").reset_index(drop=True)


def embedding_planted_verify(sf_dir: str) -> pd.DataFrame:
    """Embedding-cosine near-dup via hyperplane LSH, verified on the
    planted dups: the registered result is the planted pairs the LSH
    pipeline found, with the exact cosine recomputed from the original
    vector and its affine perturbation (float64 math → float32 storage
    round-trip, mirrored by the oracle's CAST chain)."""
    import ray.data as rd

    pairs = embedding_near_dup(sf_dir)
    planted = pairs[
        ((pairs["vec_b"] - pairs["vec_a"]) == AUG_OFFSET)
        & (pairs["vec_a"] % 5 == 0)
    ][["vec_a", "vec_b"]]
    if planted.empty:
        return pd.DataFrame({"vec_a": [], "vec_b": [], "cosine": []})
    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    # acero joins reject list<float> payload columns — ship the vector
    # as one binary cell per row through the shuffle (same trick as the
    # minhash signature transport above)
    def pack(t: pa.Table) -> pa.Table:
        V = stack_embeddings(t["embedding"]).astype(np.float32)
        return pa.table(
            {
                "vec_id": t["vec_id"],
                "emb": pa.array([V[i].tobytes() for i in range(len(V))], pa.binary()),
            }
        )

    j = rd.from_pandas(planted).join(
        emb.map_batches(pack, batch_format="pyarrow"),
        "inner",
        8,
        on=("vec_a",),
        right_on=("vec_id",),
    )

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        V = (
            np.frombuffer(b"".join(df["emb"]), dtype=np.float32)
            .reshape(len(df), -1)
            .astype(np.float64)
        )
        V2 = (V * 0.98 + 0.01).astype(np.float32).astype(np.float64)
        cos = (V * V2).sum(axis=1) / (
            np.linalg.norm(V, axis=1) * np.linalg.norm(V2, axis=1)
        )
        return df[["vec_a", "vec_b"]].assign(cosine=np.round(cos, 6))

    out = j.map_batches(verify, batch_format="pandas").to_pandas()
    out = out.astype({"vec_a": "int64", "vec_b": "int64", "cosine": "float64"})
    return out.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------


def token_counts(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        n = ts.token_count_batch(t["text"])
        return pa.table({"doc_id": t["doc_id"], "n_tokens": n.cast(pa.int64())})

    out = ds.map_batches(f, batch_format="pyarrow").to_pandas()
    out["n_tokens"] = out["n_tokens"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def quality_scores(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        cols = ts.quality_columns(t["text"].combine_chunks() if isinstance(t["text"], pa.ChunkedArray) else t["text"])
        return pa.table({"doc_id": t["doc_id"], **cols})

    out = ds.map_batches(f, batch_format="pyarrow").to_pandas()
    for c in ("n_chars", "n_tokens", "n_punct", "n_stopwords"):
        out[c] = out[c].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def lang_id_pred(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def f(df: pd.DataFrame) -> pd.DataFrame:
        df["lang_pred"] = [ts.lang_id(t) for t in df["text"]]
        return df[["doc_id", "lang", "lang_pred"]]

    out = ds.map_batches(f, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _probe_resolve(g: pd.DataFrame, out_dtype: str = "uint64") -> pd.DataFrame:
    """Msg22 availability probe within one docid bucket (docid >> 6):
    first-come by url order, next free low-6-bit slot upward, wrapping
    to the bucket floor (Titledb.h:41-87)."""
    g = g.sort_values("url")
    used: set = set()
    final = []
    for d in g["probable_docid"]:
        d = int(d)
        lo, hi = d & ~0x3F, d | 0x3F
        x = d
        while x in used and x < hi:
            x += 1
        if x in used:
            x = lo
            while x in used:
                x += 1
        used.add(x)
        final.append(x)
    g["docid"] = pd.Series(final, index=g.index, dtype=out_dtype)
    return g[["url", "probable_docid", "docid"]]


def assign_docids(sf_dir: str) -> pd.DataFrame:
    """Probable-docid assignment with collision resolution (reference
    Titledb.h:41-87, Msg22's availability probe) — the oracle-checked
    face: urls derive deterministically from the documents table and the
    probable docid is the rolling-hash fingerprint folded into a 61-
    bucket space (forcing real collisions at test scale), so DuckDB can
    recompute hash, bucket AND the sequential probe (recursive CTE)
    independently.  The probe kernel is shared with
    :func:`assign_docids_gb`, the production hash64b & 38-bit variant
    (pinned in tests/test_training.py — hash64b itself is not
    SQL-expressible)."""
    import ray.data as rd

    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def mk(df: pd.DataFrame) -> pd.DataFrame:
        urls = [f"http://h{int(d) % 50}.test/d{int(d)}" for d in df["doc_id"]]
        h = ts.fingerprint_batch(urls)
        probable = (
            (h % np.uint64(61)) * np.uint64(64) + (h % np.uint64(64))
        ).astype(np.int64)
        return pd.DataFrame(
            {"url": urls, "probable_docid": probable, "bucket": probable >> 6}
        )

    out = (
        ds.map_batches(mk, batch_format="pandas")
        .groupby("bucket")
        .map_groups(
            lambda g: _probe_resolve(g, out_dtype="int64"),
            batch_format="pandas",
        )
        .to_pandas()
    )
    out["probable_docid"] = out["probable_docid"].astype("int64")
    return out.sort_values("url").reset_index(drop=True)


def assign_docids_gb(sf_dir: str) -> pd.DataFrame:
    """Production probable-docid assignment: docid = hash64b(url) & 38
    bits (Titledb.h:41-87); collision probe as in :func:`assign_docids`,
    expressed as groupby(bucket).map_groups."""
    import ray.data as rd

    from ..functions.gbhash import probable_docid_batch
    from ..sources.synthweb import SynthWeb, WebConfig

    web = SynthWeb(WebConfig(n_hosts=40, n_hubs=3, hub_pages=20, max_pages=8))
    urls = [web.page_url(i, p) for i, p in web.iter_pages()]
    docids = probable_docid_batch(urls)
    ds = rd.from_pandas(
        pd.DataFrame({"url": urls, "probable_docid": docids.astype("uint64")})
    )

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        df["bucket"] = (df["probable_docid"].to_numpy().astype(np.uint64) >> np.uint64(6)).astype("uint64")
        return df

    out = (
        ds.map_batches(bucketize, batch_format="pandas")
        .groupby("bucket")
        .map_groups(_probe_resolve, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("url").reset_index(drop=True)


def adult_flags(sf_dir: str) -> pd.DataFrame:
    """Adult-content scoring over documents (AdultCheck.cpp semantics:
    presence-weighted needles, threshold 2)."""
    from ..functions.adultcheck import ADULT_THRESHOLD, adult_points_batch

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def f(df: pd.DataFrame) -> pd.DataFrame:
        pts = adult_points_batch(df["text"].tolist())
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "points": pts,
                "is_adult": pts >= ADULT_THRESHOLD,
            }
        )

    out = ds.map_batches(f, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _words_decorate(toks: list, doc_id: int) -> list:
    """Deterministic decoration that plants every Words.cpp merge rule
    (comma groups, decimal point, apostrophe, java++, c#) into the
    token-soup corpus; mirrored verbatim by the SQL oracle's
    list_transform CASE chain."""
    out = []
    for i0, tok in enumerate(toks):
        if i0 % 13 == doc_id % 13:
            out.append("1,234,567")
        elif i0 % 11 == doc_id % 11:
            out.append("3.14")
        elif i0 % 7 == doc_id % 7:
            out.append("don't")
        elif i0 % 5 == doc_id % 5:
            out.append("java++")
        elif i0 % 3 == doc_id % 3:
            out.append("c#")
        else:
            out.append(tok)
    return out


def words_alnum_counts(sf_dir: str) -> pd.DataFrame:
    """Words.cpp-faithful token stream (functions/words.py, reference
    Words.cpp:197-457) over a decorated corpus: every planted token
    must survive as exactly ONE alnum word (comma-group, decimal,
    apostrophe, ``java++``, ``c#`` merge rules), so the per-doc counts
    and total alnum characters are derivable analytically in SQL — a
    tokenizer that splits ``1,234,567`` or ``don't`` hash-fails on all
    three columns."""
    from ..functions.words import words_tokenize

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def f(df: pd.DataFrame) -> pd.DataFrame:
        na_l, np_l, ch_l = [], [], []
        for t, d in zip(df["text"], df["doc_id"]):
            dec = _words_decorate(t.split(" "), int(d))
            toks = words_tokenize(" ".join(dec))
            alnum = [w for w, al in toks if al]
            na_l.append(len(alnum))
            np_l.append(len(toks) - len(alnum))
            ch_l.append(sum(len(w) for w in alnum))
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "n_alnum": pd.Series(na_l, dtype="int64"),
                "n_punct": pd.Series(np_l, dtype="int64"),
                "alnum_chars": pd.Series(ch_l, dtype="int64"),
            }
        )

    out = ds.map_batches(f, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def doc_fingerprints(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def f(df: pd.DataFrame) -> pd.DataFrame:
        df["fingerprint"] = ts.fingerprint_batch(df["text"].tolist()).astype("uint64")
        return df[["doc_id", "fingerprint"]]

    out = ds.map_batches(f, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def clean_corpus(sf_dir: str) -> pd.DataFrame:
    """C4-style training-corpus cleaning in ONE pipeline: exact dedup
    (keep min doc_id per identical text, same augmented input as
    :func:`dedup_exact`) -> minimum-length filter (>= 40 whitespace
    tokens) -> per-language rollup of the kept corpus.

    Scale shape: augmentation + fingerprint + token count are
    vectorized map_batches; the dedup reduce is relational.group_agg
    (partial agg -> measured combine); the final rollup has
    lang-cardinality rows.  At 100 TB the per-lang rollup folds into
    the same combine (it is a second grouped sum over the dedup
    output), so nothing row-scale ever sits on the driver beyond the
    deduped key frame group_agg already bounds."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def aug(df: pd.DataFrame) -> pd.DataFrame:
        c = df[df["doc_id"] % 3 == 0].copy()
        c["doc_id"] += AUG_OFFSET
        return pd.concat([df, c], ignore_index=True)

    def feats(df: pd.DataFrame) -> pd.DataFrame:
        df["fp"] = ts.fingerprint_batch(df["text"].tolist()).astype("uint64")
        df["n_tokens"] = df["text"].str.split(" ").str.len().astype("int64")
        return df[["doc_id", "fp", "lang", "n_tokens"]]

    ds = ds.map_batches(aug, batch_format="pandas").map_batches(
        feats, batch_format="pandas"
    )

    from .relational import group_agg, group_agg_ds

    # duplicates share text, hence lang and n_tokens: min is exact.
    # group_agg_ds keeps the deduped (corpus-sized!) intermediate
    # DISTRIBUTED — no full-keyframe to_pandas; only the lang-cardinality
    # rollup below ever reaches the driver (r4 verdict item 7).
    dedup_ds = group_agg_ds(
        ds,
        ["fp"],
        {
            "doc_id": ("doc_id", "min"),
            "lang": ("lang", "min"),
            "n_tokens": ("n_tokens", "min"),
        },
    )

    def length_filter(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["n_tokens"] >= 40]

    kept_ds = dedup_ds.map_batches(length_filter, batch_format="pandas")
    out = group_agg(
        kept_ds,
        ["lang"],
        {"sum_tokens": ("n_tokens", "sum")},
        count_col="n_docs",
    )
    out["n_docs"] = out["n_docs"].astype("int64")
    out["sum_tokens"] = out["sum_tokens"].astype("int64")
    return out[["lang", "n_docs", "sum_tokens"]].sort_values("lang").reset_index(
        drop=True
    )


def stratified_sample(sf_dir: str, k: int = 50) -> pd.DataFrame:
    """Deterministic per-language stratified sample: the ``k`` docs
    with the smallest multiplicative hash of doc_id per lang — the
    balanced-subsample op of a training-data pipeline (per-class
    quotas).  Sampling at scale must be content-derived, not
    RNG-per-row, so reruns, retried tasks, and the SQL oracle agree
    (same rule as relational.q_sample).

    Scale shape: distributed per-group top-k — each block emits at
    most k rows per lang (vectorized sort+head, no Python loop), so
    the driver combine is bounded by k x n_langs x n_blocks, never by
    input rows; the final exact top-k is correct because a global
    top-k row is a top-k row of its own block."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "lang"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy().astype(np.uint64)
        h = (ids * np.uint64(2654435761)) % np.uint64(1 << 32)
        sub = pd.DataFrame(
            {"lang": df["lang"], "doc_id": df["doc_id"], "h": h.astype("int64")}
        )
        return (
            sub.sort_values(["lang", "h", "doc_id"])
            .groupby("lang", sort=False)
            .head(k)
        )

    parts = ds.map_batches(partial, batch_format="pandas", batch_size=64 * 1024)
    allp = parts.to_pandas()
    out = (
        allp.sort_values(["lang", "h", "doc_id"])
        .groupby("lang", sort=False)
        .head(k)[["lang", "doc_id"]]
    )
    out["doc_id"] = out["doc_id"].astype("int64")
    return out.sort_values(["lang", "doc_id"]).reset_index(drop=True)


def pack_documents(sf_dir: str, budget: int = 4096, n_buckets: int = 64) -> pd.DataFrame:
    """Sequence packing — the LLM-training-data op that fills fixed
    context budgets: next-fit packing of documents (by n_chars) into
    bins of ``budget`` chars, processed as ``n_buckets`` independent
    deterministic streams (doc_id % n_buckets, doc_id-ordered within
    a stream).  Global packing is inherently sequential; sharding the
    stream is the scale form — each bucket packs independently and
    bin ids are (bucket, bin) pairs, so a 100 TB corpus packs as
    n_buckets parallel scans with no cross-worker state.  A doc
    longer than the budget gets its own bin (classic next-fit).

    Scale shape: one bounded bucket-hash shuffle (same invariant-7
    shape as group_agg_ds), then ONE ordered linear pass per bucket —
    the per-row loop is the op's true data dependency, not an
    accident, and it touches two ints per row.  The returned per-doc
    assignment frame is corpus-sized — forced by the queries()
    DataFrame contract; the 100 TB form writes each bucket's
    assignments straight back to storage from its map_groups task
    (drop the .to_pandas, add write_parquet) and returns a rollup."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df[["doc_id", "n_chars"]].copy()
        df["bucket"] = (df["doc_id"] % n_buckets).astype("int64")
        return df

    part = ds.map_batches(add_bucket, batch_format="pandas", batch_size=128 * 1024)

    def pack(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id")
        ids = g["doc_id"].to_numpy()
        sizes = g["n_chars"].to_numpy().astype(np.int64)
        bins = np.empty(len(g), dtype=np.int64)
        acc = 0
        b = 0
        for i, n in enumerate(sizes):
            if i and acc + n > budget:
                b += 1
                acc = int(n)
            else:
                acc += int(n)
            bins[i] = b
        return pd.DataFrame(
            {"doc_id": ids, "bucket": g["bucket"].to_numpy(), "bin": bins}
        )

    out = part.groupby("bucket").map_groups(pack, batch_format="pandas").to_pandas()
    out = out.astype({"doc_id": "int64", "bucket": "int64", "bin": "int64"})
    return out.sort_values("doc_id").reset_index(drop=True)


def decontaminate(sf_dir: str, eval_source: str = "src0", k: int = 3) -> pd.DataFrame:
    """Train-test decontamination: every (train_doc, eval_doc) pair
    sharing a k-token shingle, with the eval split defined by
    ``source == eval_source``.  The benchmark-leak scan every serious
    LLM data pipeline runs before training.

    Scale shape: the EVAL side is small by definition (benchmarks vs
    a 100 TB train corpus), so its shingle->doc_ids index broadcasts
    once (ray.put) and the train corpus streams through one
    map_batches probe — no shuffle, no join, corpus never moves.
    Shingles here are literal token trigrams to stay bit-equal to the
    SQL twin; at real scale the same pipeline runs on 64-bit shingle
    hashes (functions/dedup.shingle_hashes) with identical structure."""
    import ray

    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "source"])

    def _shingles(text: str) -> set:
        t = text.split()
        return {" ".join(t[i : i + k]) for i in range(len(t) - k + 1)}

    ev = docs.filter(expr=f"source == {eval_source!r}").to_pandas()
    index: dict = {}
    for d, tx in zip(ev["doc_id"], ev["text"]):
        for sh in _shingles(tx):
            index.setdefault(sh, []).append(int(d))
    ref = ray.put(index)

    def probe(df: pd.DataFrame) -> pd.DataFrame:
        import ray as _ray

        idx = _ray.get(ref)
        sub = df[df["source"] != eval_source]
        out_a: list = []
        out_b: list = []
        for d, tx in zip(sub["doc_id"], sub["text"]):
            hits: set = set()
            for sh in _shingles(tx):
                evs = idx.get(sh)
                if evs:
                    hits.update(evs)
            if hits:
                out_a.extend([int(d)] * len(hits))
                out_b.extend(sorted(hits))
        return pd.DataFrame(
            {
                "doc_id": pd.Series(out_a, dtype="int64"),
                "eval_doc": pd.Series(out_b, dtype="int64"),
            }
        )

    out = docs.map_batches(probe, batch_format="pandas", batch_size=4096).to_pandas()
    return out.sort_values(["doc_id", "eval_doc"]).reset_index(drop=True)


def redact_pii(sf_dir: str) -> pd.DataFrame:
    """PII redaction — the scrubbing stage of a training-data
    pipeline: emails, IPv4 literals, and international phone numbers
    replaced by type tags, applied in a fixed order (email -> ip ->
    phone).  The fixture corpus is token soup with no organic PII, so
    docs with doc_id % 7 == 0 get a deterministic planted contact
    line (the SQL twin plants the identical line and re-runs the same
    regexes via RE2 — the patterns use only character classes and
    bounded repeats, the dialect-neutral subset).

    Scale shape: embarrassingly parallel map_batches; the regexes
    compile once per worker (module-level), counts and replacement
    run on pandas' vectorized str kernels.  Returning the redacted
    corpus as a DataFrame is queries()-contract-forced; the 100 TB
    form is map_batches -> write_parquet, never a driver gather."""
    import re as _re

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    pats = [
        (_re.compile(r"[a-z0-9._]+@[a-z0-9.-]+\.[a-z]+"), "<EMAIL>"),
        (_re.compile(r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}"), "<IP>"),
        (_re.compile(r"\+\d{8,13}"), "<PHONE>"),
    ]

    def scrub(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy()
        txt = df["text"].copy()
        m = ids % 7 == 0
        plant = pd.Series(
            [
                f" contact u{d}@example.com from 10.{d % 256}.0.1 call +1555{d % 10000:04d}"
                for d in ids[m]
            ],
            index=txt.index[m],
        )
        txt.loc[m] = txt.loc[m] + plant
        n_pii = pd.Series(np.zeros(len(df), dtype=np.int64), index=txt.index)
        for rx, tag in pats:
            n_pii += txt.str.count(rx)
            txt = txt.str.replace(rx, tag, regex=True)
        return pd.DataFrame(
            {"doc_id": ids, "redacted": txt, "n_pii": n_pii.astype("int64")}
        )

    out = ds.map_batches(scrub, batch_format="pandas", batch_size=4096).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)
