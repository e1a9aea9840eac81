"""Training-data ops: planted near-duplicates must be found; kernels
behave as specified."""

import numpy as np
import pytest

from open_source_search_engine_ray.functions import dedup as dd
from open_source_search_engine_ray.functions import textstats as ts
from open_source_search_engine_ray.pipelines import training as T

SF_DIR = "/root/testdata/sf0.001"


# -- kernels ----------------------------------------------------------------


def test_minhash_estimates_jaccard():
    a = "the quick brown fox jumps over the lazy dog and runs far away today"
    b = "the quick brown fox jumps over the lazy cat and runs far away today"
    fa, la = dd.token_hashes([a, b])
    sh, lens = dd.shingle_hashes(fa, la)
    sig = dd.minhash_signatures(sh, lens, num_perm=128)
    est = dd.signature_jaccard(sig[0], sig[1])
    true = dd.exact_jaccard(a, b)
    assert abs(est - true) < 0.25
    assert dd.exact_jaccard(a, a) == 1.0


def test_simhash_near_for_near_texts():
    a = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    b = a.replace("gamma", "gamma2")
    fa, la = dd.token_hashes([a, b, "completely different words entirely unrelated"])
    sh = dd.simhash(fa, la)
    d_near = dd.hamming64(sh[:1], sh[1:2])[0]
    d_far = dd.hamming64(sh[:1], sh[2:3])[0]
    assert d_near < d_far
    assert d_near <= 12


def test_cosine_topk_correct():
    rng = np.random.default_rng(1)
    V = rng.normal(size=(50, 8))
    Q = V[:3] + rng.normal(scale=0.01, size=(3, 8))
    scores, idx = dd.cosine_topk(Q, V, k=1)
    assert idx[:, 0].tolist() == [0, 1, 2]
    assert (scores[:, 0] > 0.99).all()


def test_fingerprint_stable_and_distinct():
    assert ts.fingerprint("hello world") == ts.fingerprint("hello world")
    assert ts.fingerprint("hello world") != ts.fingerprint("hello worle")
    batch = ts.fingerprint_batch(["a", "hello world", ""])
    assert int(batch[1]) == ts.fingerprint("hello world")
    assert int(batch[2]) == 0


def test_lang_id_basics():
    assert ts.lang_id("the cat and the dog went to the market for food") == "en"
    assert ts.lang_id("der hund und die katze ist nicht mit ein mann") == "de"
    assert ts.lang_id("") == "xx"


# -- pipelines over testdata (planted duplicates) ---------------------------


@pytest.fixture(scope="module")
def _ray(ray_session):
    return None


def test_dedup_exact_removes_planted(_ray):
    out = T.dedup_exact(SF_DIR)
    # every kept id is an original (the planted copies have +AUG_OFFSET)
    assert (out["doc_id"] < T.AUG_OFFSET).all()
    import duckdb

    n_docs = duckdb.sql(f"select count(*) from '{SF_DIR}/documents.parquet'").fetchone()[0]
    assert len(out) == n_docs


def test_minhash_finds_planted(_ray):
    pairs = T.minhash_lsh_dedup(SF_DIR)
    import duckdb

    planted = duckdb.sql(
        f"select doc_id from '{SF_DIR}/documents.parquet' where doc_id % 4 = 0"
    ).df()["doc_id"]
    found = {(a, b) for a, b in zip(pairs["doc_a"], pairs["doc_b"])}
    hits = sum((int(d), int(d) + T.AUG_OFFSET) in found for d in planted)
    assert hits / len(planted) > 0.8  # LSH recall on planted near-dups


def test_simhash_finds_planted(_ray):
    pairs = T.simhash_dedup(SF_DIR)
    import duckdb

    planted = duckdb.sql(
        f"select doc_id from '{SF_DIR}/documents.parquet' where doc_id % 4 = 0"
    ).df()["doc_id"]
    found = {(a, b) for a, b in zip(pairs["doc_a"], pairs["doc_b"])}
    hits = sum((int(d), int(d) + T.AUG_OFFSET) in found for d in planted)
    assert hits / len(planted) > 0.5


def test_ngram_jaccard_verifies(_ray):
    pairs = T.ngram_jaccard_pairs(SF_DIR)
    assert (pairs["jaccard"] >= 0.4).all()
    assert len(pairs) > 0


def test_embedding_near_dup_finds_planted(_ray):
    pairs = T.embedding_near_dup(SF_DIR)
    planted = pairs[(pairs["vec_b"] - pairs["vec_a"]) == T.AUG_OFFSET]
    assert len(planted) > 0
    assert (planted["cosine"] >= 0.95).all()


def test_ann_ivf_recall_vs_brute_force(_ray):
    """IVF at its defaults must recover >=85% of the exact top-10
    (fixture clusters are broad; see ann_topk_ivf docstring)."""
    exact = T.ann_topk(SF_DIR)
    approx = T.ann_topk_ivf(SF_DIR)
    e = {(q, v) for q, v in zip(exact["query_id"], exact["vec_id"])}
    a = {(q, v) for q, v in zip(approx["query_id"], approx["vec_id"])}
    assert len(a & e) / len(e) >= 0.85
    # deterministic across runs
    again = T.ann_topk_ivf(SF_DIR)
    assert approx.equals(again)


def test_lang_id_pipeline_runs(_ray):
    # NOTE: the testdata 'lang' labels are synthetic (the text is the same
    # English-ish token soup for every label), so accuracy vs labels is
    # meaningless; real-language behavior is covered by test_lang_id_basics.
    out = T.lang_id_pred(SF_DIR)
    assert len(out) == 500
    assert set(out["lang_pred"]) <= {"en", "de", "fr", "es", "it", "xx"}


def _oracle_compare(key, sf_dir):
    import duckdb
    import pandas as pd

    import __ray_entry__ as E

    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    eng = E.queries()[key](sf_dir)
    if not isinstance(eng, pd.DataFrame):
        eng = eng.to_pandas()
    ora = con.sql(E.oracle_sql()[key]).df()
    cols = sorted(eng.columns)
    eng = eng[cols].sort_values(cols).reset_index(drop=True)
    ora = ora[cols].sort_values(cols).reset_index(drop=True)
    ora = ora.astype(eng.dtypes.to_dict())
    con.close()
    assert eng.equals(ora), (key, len(eng), len(ora))


def test_neardup_family_matches_duckdb_oracle(_ray):
    """The registered near-dup queries are hash-checkable: the sketch
    pipelines' planted-pair output (and ngram's full exact-jaccard pair
    set) must equal the DuckDB oracle row-for-row — a single missed
    planted pair or a wrong similarity value fails here before it fails
    in the driver's CORRECTNESS gate."""
    for key in (
        "minhash_lsh_dedup",
        "ngram_jaccard_pairs",
        "embedding_near_dup",
        "lang_id",
        "dedup_groups",
    ):
        _oracle_compare(key, SF_DIR)


def test_lang_id_scripts():
    """Non-Latin scripts resolve by Unicode block vote (the script half
    of LanguageIdentifier.cpp); Latin text still uses stopwords; kana
    presence is decisive over CJK ideographs."""
    cases = {
        "привет как дела сегодня вечером": "ru",
        "今日は良い天気ですね、こんにちは": "ja",
        "这是一个中文句子，没有假名": "zh",
        "안녕하세요 오늘 날씨가 좋네요": "ko",
        "مرحبا كيف حالك اليوم": "ar",
        "שלום מה שלומך היום": "he",
        "γεια σας τι κανετε σημερα": "el",
        "नमस्ते आप कैसे हैं आज": "hi",
        "สวัสดีครับวันนี้อากาศดี": "th",
        "the quick brown fox jumps over the lazy dog": "en",
        "": "xx",
        "café résumé naïve": "xx",  # a few accents ≠ a non-Latin script
    }
    for text, want in cases.items():
        assert ts.lang_id(text) == want, (text, want, ts.lang_id(text))


def test_dedup_groups_transitive(_ray):
    """Connected components merge chains: a~b and b~c land in one group
    labeled by the component minimum."""
    g = T.dedup_groups(SF_DIR)
    assert len(g) > 0
    # canonical label is the min of each cluster and a member of it
    for gid, grp in g.groupby("group_id"):
        assert gid == grp["doc_id"].min()
    # the corpus has organic chains, so some cluster exceeds a pair
    assert (g.groupby("group_id").size() > 2).any()


def test_assign_docids_gb_probe_invariants(_ray):
    """Production hash64b docid assignment (the non-SQL-expressible
    variant): probe stays inside the 64-slot bucket, docids are unique,
    and non-colliding urls keep their probable docid (Titledb.h:41-87)."""
    import numpy as np

    out = T.assign_docids_gb(SF_DIR)
    d = out["docid"].to_numpy().astype(np.uint64)
    p = out["probable_docid"].to_numpy().astype(np.uint64)
    assert len(np.unique(d)) == len(d)
    assert ((d >> np.uint64(6)) == (p >> np.uint64(6))).all()
    # rows whose probable docid is unique must keep it
    uniq, cnt = np.unique(p, return_counts=True)
    solo = np.isin(p, uniq[cnt == 1])
    assert (d[solo] == p[solo]).all()


def test_cc_min_label_rounds_matches_union_find(_ray):
    """The distributed min-label hash-join CC (the >driver_edge_max
    path) must produce the exact union-find labeling: long chains force
    multiple propagation rounds; star + chain + pair topologies and
    non-contiguous ids exercise the bucket co-group."""
    import numpy as np
    import pandas as pd

    rng = np.random.Generator(np.random.PCG64(3))
    edges = []
    nid = 10_000
    for _ in range(8):  # chains of length 20 (diameter forces rounds)
        ids = nid + np.arange(20) * 17
        nid += 1000
        edges += [(int(x), int(y)) for x, y in zip(ids[:-1], ids[1:])]
    for _ in range(5):  # stars
        c = nid
        nid += 1000
        edges += [(c, c + int(k)) for k in rng.integers(1, 900, 12)]
    edges += [(5, 7), (900_000_001, 900_000_002)]  # isolated pairs
    pairs = pd.DataFrame(edges, columns=["doc_a", "doc_b"]).drop_duplicates()
    got = T.cc_min_label_rounds(pairs, n_buckets=8)

    # driver union-find oracle (same as dedup_groups' small path)
    parent = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != r:
            parent[x], x = r, parent[x]
        return r

    for x, y in pairs.itertuples(index=False):
        rx, ry = find(int(x)), find(int(y))
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)
    nodes = sorted(set(pairs["doc_a"]) | set(pairs["doc_b"]))
    want = pd.DataFrame(
        {"doc_id": nodes, "group_id": [find(n) for n in nodes]}
    ).astype({"doc_id": "int64", "group_id": "int64"})
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want)


def test_dedup_groups_distributed_path_matches(_ray):
    """dedup_groups with driver_edge_max=0 (forcing the distributed CC)
    equals the default union-find result on the real corpus."""
    import pandas as pd

    small = T.dedup_groups(SF_DIR)
    dist = T.dedup_groups(SF_DIR, driver_edge_max=0)
    pd.testing.assert_frame_equal(
        dist.reset_index(drop=True), small.reset_index(drop=True)
    )
