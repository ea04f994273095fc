"""Document deduplication suite for training-data pipelines.

Four strategies over the ``documents`` table (doc_id, text, …):
  - exact:        md5 fingerprint group-by (engine-portable hashing)
  - minhash LSH:  shingle → per-band min(md5(shingle ∥ band)) → band-bucket
                  join; near-dup pairs verified by exact shingle Jaccard
  - simhash:      64-bit sign-sum of per-token md5 bits; hamming-ball match
  - n-gram jaccard: exact Jaccard on word n-gram sets for candidate pairs

All column-level logic is built-in ``pyspark.sql.functions`` (JVM-side,
codegen'd): no Python UDFs anywhere in this module. Hashes are md5-hex so a
DuckDB oracle can reproduce every value bit-for-bit.

Scale notes: minhash bands bound the join fan-out (no O(n²) compare); the
band-bucket join is an equi-join AQE can split on skewed buckets; simhash
prefix buckets (16-bit) bound the hamming search the same way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_dup_clusters(docs: DataFrame) -> DataFrame:
    """Clusters of byte-identical texts: (fingerprint, n_docs, min_doc_id)."""
    return (
        docs.withColumn("fingerprint", F.md5("text"))
        .groupBy("fingerprint")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("keep_doc_id"),
        )
        .filter(F.col("n_docs") > 1)
    )


def paragraph_dup_stats(docs: DataFrame, min_docs: int = 2) -> DataFrame:
    """Cross-document paragraph-level exact dedup (the RefinedWeb /
    MassiveText recipe: a paragraph repeated across many pages is
    boilerplate — nav bars, cookie banners, license footers — and is
    removed from every page, not just deduped at document granularity).

    Split each doc on newline runs, trim, drop empties, md5 each
    paragraph, and return every paragraph that occurs in ≥ ``min_docs``
    DISTINCT documents: (para_hash, n_docs, n_occurrences, para_chars).

    Scale shape: one narrow split+explode pass over the corpus, one
    hash-partitioned groupBy on the paragraph hash with map-side partial
    aggregation; the output is proportional to the boilerplate incidence,
    not the corpus size. No UDFs — md5/split are codegen'd, so a DuckDB
    oracle reproduces every hash bit-for-bit."""
    paras = (
        docs.select(
            "doc_id",
            F.explode(F.split(F.col("text"), r"\n+")).alias("para"),
        )
        .select("doc_id", F.trim(F.col("para")).alias("para"))
        .filter(F.length("para") > 0)
    )
    return (
        paras.groupBy(F.md5("para").alias("para_hash"))
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_occurrences"),
            F.min(F.length("para")).alias("para_chars"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )


def _tokens(col):
    toks = F.split(F.lower(F.regexp_replace(col, r"[^\w\s]", " ")), r"\s+")
    return F.filter(toks, lambda t: t != "")


def _shingles_of(tk_col, k: int):
    """Shingles from an ALREADY-MATERIALIZED token-array column.

    The tokenization expression must not be inlined here: Catalyst does not
    CSE subexpressions inside nested higher-order-function lambdas, so an
    inlined split/filter tree is re-evaluated once per F.get — O(k·n²) per
    row. Callers materialize tokens with withColumn first."""
    n = F.size(tk_col)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    return F.array_distinct(
        F.transform(
            idx,
            lambda i: F.concat_ws(" ", *[F.get(tk_col, i + j) for j in range(k)]),
        )
    )


def _shingles(col, k: int = 3):
    """Word k-shingles straight from a text column (small inputs only — see
    _shingles_of for the materialized fast path)."""
    return _shingles_of(_tokens(col), k)


def _shingle_table(docs: DataFrame, k: int) -> DataFrame:
    """(doc_id, sh): the per-doc distinct shingle array."""
    return docs.withColumn("_tk", _tokens(F.col("text"))).select(
        "doc_id", _shingles_of(F.col("_tk"), k).alias("sh")
    )


def _band_sigs(sh: DataFrame, n_bands: int) -> DataFrame:
    """(doc_id, band, mh) from a shingle-array table."""
    bands = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.array_min(
                F.transform("sh", lambda s: F.md5(F.concat(s, F.lit(f"#{b}"))))
            ).alias("mh"),
        )
        for b in range(n_bands)
    ])
    return sh.select("doc_id", F.explode(bands).alias("x")).select(
        "doc_id", F.col("x.band").alias("band"), F.col("x.mh").alias("mh")
    )


#: (n_bands → gram → [band-salted md5 hexes]) — see _shingle_mhs_kernel
_MD5_BAND_CACHE: dict[int, dict[str, list[str]]] = {}
#: token → truncated md5 int — see simhash()
_MD5_TOKEN_CACHE: dict[str, int] = {}


def _shingle_mhs_kernel(n_bands: int, k: int, with_sh: bool, id_type: str):
    """Arrow-batched (doc_id[, sh], mhs) kernel: distinct word k-shingles
    and the per-band min-md5 signatures, computed row-locally in one pass
    (r6, guide §4.2 — replaces the interpreted transform/array_min HOF
    forest; md5 hex and the shingle construction are byte-identical to the
    SQL twin, including the short-doc concat_ws-skips-missing semantics and
    lexicographic hex min)."""
    import hashlib
    import re
    from typing import Iterator

    import pandas as pd

    punct = re.compile(r"[^\w\s]", re.ASCII)
    ws = re.compile(r"\s+", re.ASCII)
    suffixes = [f"#{b}".encode() for b in range(n_bands)]
    # r6: md5 is a pure function of (gram, band) and corpora repeat shingles
    # (Zipf), so per-gram band digests are cached across docs AND tasks
    # (module-level, reused Python workers). Capped so a pathological
    # vocabulary degrades to the plain path; values identical by purity.
    cache = _MD5_BAND_CACHE.setdefault(n_bands, {})

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        md5 = hashlib.md5
        for pdf in batches:
            out = {"doc_id": [], "mhs": []}
            if with_sh:
                out["sh"] = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                toks = [t for t in
                        ws.split(punct.sub(" ", (text or "").lower())) if t]
                n = len(toks)
                grams = list(dict.fromkeys(
                    " ".join(toks[i:i + k]) for i in range(max(n - k, 0) + 1)))
                out["doc_id"].append(doc_id)
                if with_sh:
                    out["sh"].append(grams)
                rows = []
                for g in grams:
                    hx = cache.get(g)
                    if hx is None:
                        e = g.encode()
                        hx = [md5(e + suf).hexdigest() for suf in suffixes]
                        if len(cache) < 200_000:
                            cache[g] = hx
                    rows.append(hx)
                out["mhs"].append(
                    [min(r[b] for r in rows) for b in range(n_bands)])
            yield pd.DataFrame(out)

    cols = f"doc_id {id_type}, "
    if with_sh:
        cols += "sh array<string>, "
    return kernel, cols + "mhs array<string>"


def minhash_signatures(docs: DataFrame, n_bands: int = 8, k: int = 3) -> DataFrame:
    """(doc_id, band, mh): per-band minhash of word k-shingles — the
    signatures come from the row-local Arrow kernel (one narrow map), then
    one posexplode to the per-band rows."""
    kernel, schema = _shingle_mhs_kernel(
        n_bands, k, with_sh=False,
        id_type=docs.schema["doc_id"].dataType.simpleString())
    sigs = docs.select("doc_id", "text").mapInPandas(kernel, schema=schema)
    return sigs.select(
        "doc_id", F.posexplode("mhs").alias("band", "mh"))


def minhash_dup_pairs(
    docs: DataFrame, n_bands: int = 8, k: int = 3, threshold: float = 0.8
) -> DataFrame:
    """Near-duplicate pairs: LSH band-bucket candidates verified by exact
    shingle Jaccard ≥ threshold. Returns (doc_a, doc_b, jaccard), doc_a<doc_b.

    r6 shape (guide §8: decide with small co-located data, never shuffle
    the payload per-pair): the old plan joined every candidate PAIR back to
    the shingle-array table twice — at sf1.0 that carried 4.2M candidate
    rows × ~1 KB of shingles per side (~8 GB of exchange) to keep 2.5k
    pairs, after a .distinct() exchange over all candidates. Now each doc's
    shingle set travels ONCE per band into its (band, mh) bucket
    (n_bands × corpus bytes, the minimum any bucket-verify needs), and an
    Arrow-batched kernel verifies all pairs inside the bucket. Cross-band
    duplicate candidates are dropped map-side by the first-collision rule
    (emit a pair only in the LOWEST band whose minhashes agree — each doc
    carries its full mh vector, so no dedup exchange is needed).
    Jaccard/rounding arithmetic is bit-identical (int set sizes, double
    division, HALF_UP 1e-6 — the same formula the similarity kernels use).
    Per-bucket work is quadratic in bucket size exactly as the join output
    was; a bucket is one task either way (same single join key)."""
    import pandas as pd

    id_type = docs.schema["doc_id"].dataType.simpleString()
    kernel, schema = _shingle_mhs_kernel(n_bands, k, with_sh=True,
                                         id_type=id_type)
    posted = (
        docs.select("doc_id", "text").mapInPandas(kernel, schema=schema)
        .select("doc_id", "sh", "mhs",
                F.posexplode("mhs").alias("band", "mh"))
    )

    def verify(pdf: pd.DataFrame, out_a, out_b, out_j) -> None:
        m = len(pdf)
        if m >= 2:
            band = int(pdf["band"].iloc[0])
            order = sorted(range(m), key=lambda i: pdf["doc_id"].iloc[i])
            ids = [pdf["doc_id"].iloc[i] for i in order]
            sets = [frozenset(pdf["sh"].iloc[i]) for i in order]
            vecs = [list(pdf["mhs"].iloc[i][:band]) for i in order]
            for i in range(m):
                si, vi = sets[i], vecs[i]
                for j in range(i + 1, m):
                    # first-collision: skip pairs already met in a lower band
                    if any(a == b for a, b in zip(vi, vecs[j])):
                        continue
                    inter = len(si & sets[j])
                    union = len(si) + len(sets[j]) - inter
                    jac = inter / union
                    if jac >= threshold:
                        # HALF_UP to 6dp (F.round semantics; jac >= 0)
                        out_a.append(ids[i])
                        out_b.append(ids[j])
                        out_j.append(int(jac * 1e6 + 0.5) / 1e6)

    def partition_verify(batches):
        # r6 (same restructure as similarity.lsh_ann_pairs): one pandas
        # concat + groupby per PARTITION instead of one Arrow/pandas
        # dispatch per bucket — with many small (band, mh) buckets the
        # per-group dispatch dominates the set math; the hash repartition
        # below co-locates every bucket's rows in one partition, so the
        # per-bucket pair sets (and values) are unchanged
        chunks = list(batches)
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True)
            out_a, out_b, out_j = [], [], []
            for _, g in pdf.groupby(["band", "mh"], sort=False):
                verify(g, out_a, out_b, out_j)
            yield pd.DataFrame({"doc_a": out_a, "doc_b": out_b,
                                "jaccard": out_j})

    return posted.repartition("band", "mh").mapInPandas(
        partition_verify,
        schema=f"doc_a {id_type}, doc_b {id_type}, jaccard double")


def simhash(docs: DataFrame, bits: int = 64) -> DataFrame:
    """(doc_id, simhash): sign-sum simhash from per-token md5 bits.

    bit_j(token) = j-th bit of md5(token); simhash bit j = majority vote
    (2·ones > n form). r6 shape (guide §2.4/§4.2): the whole signature is
    row-local integer arithmetic, so it runs as ONE Arrow-batched kernel —
    md5 per distinct token, a vectorized per-bit segment sum
    (np.add.reduceat over the batch's token matrix), majority vote, done.
    The previous shape exploded every distinct token into a 61-column
    groupBy — a shuffle of ~45 rows × 61 longs per doc that existed only
    to reassemble what the row already had. Tokenization mirrors the SQL
    twin exactly (ASCII \\w/\\s, the Java regex default); md5 and the
    15-hex-digit truncation are byte-identical, all integer math — the
    DuckDB oracle still replays the exploded ±1 form bit-for-bit.
    Docs with zero tokens are absent from the result, as before."""
    import hashlib
    import re
    from typing import Iterator

    import numpy as np
    import pandas as pd

    id_type = docs.schema["doc_id"].dataType.simpleString()
    punct = re.compile(r"[^\w\s]", re.ASCII)
    ws = re.compile(r"\s+", re.ASCII)
    shifts = np.arange(60, dtype=np.uint64)
    pow2 = (np.uint64(1) << shifts).astype(np.int64)
    cache = _MD5_TOKEN_CACHE  # pure value cache (md5 of the token bytes)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        md5 = hashlib.md5
        for pdf in batches:
            ids, hs, counts = [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                toks = dict.fromkeys(
                    t for t in ws.split(punct.sub(" ", (text or "").lower()))
                    if t)
                if not toks:
                    continue
                ids.append(doc_id)
                counts.append(len(toks))
                for t in toks:
                    h = cache.get(t)
                    if h is None:
                        h = int(md5(t.encode()).hexdigest()[:15], 16)
                        if len(cache) < 500_000:
                            cache[t] = h
                    hs.append(h)
            if not ids:
                continue
            H = np.array(hs, dtype=np.uint64)
            B = ((H[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64)
            starts = np.zeros(len(ids), dtype=np.int64)
            np.cumsum(np.array(counts[:-1], dtype=np.int64), out=starts[1:])
            ones = np.add.reduceat(B, starts, axis=0)
            n = np.array(counts, dtype=np.int64)[:, None]
            sim = ((2 * ones > n) * pow2[None, :]).sum(axis=1)
            yield pd.DataFrame({"doc_id": ids, "simhash": sim})

    return docs.select("doc_id", "text").mapInPandas(
        kernel, schema=f"doc_id {id_type}, simhash long")


#: the 60-bit simhash split into 4 disjoint 15-bit blocks — by pigeonhole
#: any pair with hamming distance ≤ 3 agrees on at least one whole block
#: (Charikar multi-table recipe), so bucketing each block guarantees every
#: hamming-≤3 pair a collision; the old single 16-bit-prefix bucket missed
#: pairs whose differing bits all fell inside the prefix.
_SIMHASH_BLOCKS = 4
_SIMHASH_BLOCK_BITS = 15


def simhash_pairs_from_sigs(sigs: DataFrame, max_hamming: int = 3,
                            chunk: int = 1024) -> DataFrame:
    """Near-dup pairs from a (doc_id, simhash) signature table.

    Multi-table LSH: each signature is posted under 4 (block_id, block_key)
    buckets; candidates meet in an equi-join per bucket and are verified by
    exact hamming map-side. Guaranteed recall for hamming ≤ 3 with 60-bit
    hashes; no all-pairs compare.

    Two r6 restructurings (guide §2.4 / §2.5):

    * First-collision dedup replaces the old ``.distinct()``: a pair
      colliding in several tables used to be deduped by an exchange over
      EVERY verified pair (quadratic in near-dup cluster sizes). Both
      simhashes ride the join row, so table membership is recomputable
      map-side — emit the pair only from the LOWEST table whose blocks
      agree (every earlier table's block must differ). Exactly one row per
      qualifying pair, zero dedup shuffle.

    * Triangular chunk-split fixes same-key skew AQE cannot touch: a mass-
      duplicate corpus concentrates thousands of docs on ONE (tbl, key)
      value (observed 15.7k docs → 123M comparisons in a single task).
      Each bucket member gets a deterministic chunk id
      ``pmod(xxhash64(doc_id), ceil(n/chunk))``; the self-join runs on
      (tbl, key, i, j) chunk pairs with i ≤ j, so a hot bucket becomes
      nc·(nc+1)/2 independent join groups of ~chunk² comparisons each.
      Bucket sizes come from one small aggregation (≤ tables·2^15 rows,
      bounded by the key width — always broadcastable)."""
    mask = (1 << _SIMHASH_BLOCK_BITS) - 1

    def _block(sim, t):
        return F.shiftright(sim, t * _SIMHASH_BLOCK_BITS).bitwiseAND(F.lit(mask))

    posted = sigs.select(
        "doc_id", "simhash",
        F.explode(F.array(*[
            F.struct(F.lit(t).alias("tbl"), _block(F.col("simhash"), t).alias("key"))
            for t in range(_SIMHASH_BLOCKS)
        ])).alias("b"),
    ).select("doc_id", "simhash", "b.tbl", "b.key")
    sizes = posted.groupBy("tbl", "key").agg(F.count("*").alias("_n"))
    chunked = (
        posted.join(F.broadcast(sizes), ["tbl", "key"])
        .withColumn("nc", F.ceil(F.col("_n") / chunk).cast("int"))
        .withColumn("ci", F.pmod(F.xxhash64("doc_id"), F.col("nc")).cast("int"))
        .drop("_n")
    )
    x = chunked.select(
        F.col("doc_id").alias("da"), F.col("simhash").alias("sa"),
        "tbl", "key", F.col("ci").alias("i"),
        F.explode(F.sequence(F.col("ci"), F.col("nc") - 1)).alias("j"),
    )
    y = chunked.select(
        F.col("doc_id").alias("db"), F.col("simhash").alias("sb"),
        "tbl", "key", F.col("ci").alias("j"),
        F.explode(F.sequence(F.lit(0), F.col("ci"))).alias("i"),
    )
    first_collision = F.lit(True)
    for t in range(_SIMHASH_BLOCKS - 1):
        first_collision = first_collision & (
            (F.col("tbl") <= t)
            | (_block(F.col("sa"), t) != _block(F.col("sb"), t))
        )
    ham = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
    pairs = (
        x.join(y, ["tbl", "key", "i", "j"])
        # same-chunk groups see both orientations — keep one; cross-chunk
        # groups see exactly one orientation (chunk ids fix the sides)
        .filter((F.col("i") < F.col("j")) | (F.col("da") < F.col("db")))
        .filter(ham <= max_hamming)
        .filter(first_collision)
        .select(
            F.least("da", "db").alias("doc_a"),
            F.greatest("da", "db").alias("doc_b"),
            ham.alias("hamming"),
        )
    )
    return pairs


def simhash_dup_pairs(docs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by simhash hamming distance, multi-table-bucketed so
    the self-join never goes cartesian AND every hamming-≤3 pair is found.

    The signature table is persisted before the self-join: Catalyst does
    NOT collapse the two sides into a ReusedExchange here (verified on the
    executed plan — the tokenize→explode→61-column agg appeared twice), so
    without the cache the full signature computation runs twice per action.
    Signatures are ~16 bytes/doc — roughly 1000× smaller than the text they
    summarize — so MEMORY_AND_DISK is cheap at any scale (measured: pairs
    query 6.4 s → ~sigs+join at sf0.1)."""
    from pyspark import StorageLevel

    sigs = simhash(docs).persist(StorageLevel.MEMORY_AND_DISK)
    return simhash_pairs_from_sigs(sigs, max_hamming)


def ngram_jaccard_pairs(
    docs: DataFrame, k: int = 3, threshold: float = 0.5, hot_cap: int = 100
) -> DataFrame:
    """n-gram Jaccard for candidate pairs sharing ≥1 (non-hot) shingle.

    Inverted-index join (shingle → docs) with a frequency cap on hot shingles
    (stop-shingle pruning — the classic skew guard for inverted joins; a
    shingle in > ``hot_cap`` docs generates O(cap²) pairs and carries no
    dedup signal). Jaccard is computed over the pruned shingle space on both
    sides, so near-dup pairs above ``threshold`` still surface.
    """
    kernel, schema = _shingle_mhs_kernel(
        0, k, with_sh=True,
        id_type=docs.schema["doc_id"].dataType.simpleString())
    sh = (docs.select("doc_id", "text").mapInPandas(kernel, schema=schema)
          .select("doc_id", F.explode("sh").alias("s")))
    hot = sh.groupBy("s").count().filter(F.col("count") > hot_cap)  # stop-shingles
    # persist the pruned shingle table: it feeds BOTH sides of the
    # inverted-index self-join AND the per-doc size agg, and Catalyst does
    # not collapse those three subtrees into a ReusedExchange (verified: 8
    # FileScans of the docs parquet in the executed plan without the cache).
    # Shingle rows are (id, hashable string) — a small fraction of the text
    # they index — so MEMORY_AND_DISK is cheap at any scale. (A raw-rows
    # persist BEFORE the hot census was tried and measured slower at both
    # sfs — the per-consumer anti-join replay costs more than the one
    # extra kernel pass it saves.)
    from pyspark import StorageLevel

    sh = (sh.join(F.broadcast(hot), "s", "left_anti")
          .persist(StorageLevel.MEMORY_AND_DISK))
    cand = (
        sh.alias("x").join(sh.alias("y"), "s")
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .groupBy(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    # sizes over the same pruned shingle space (consistent jaccard)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    return (
        cand.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "n_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "n_b"), "doc_b")
        .withColumn("jaccard", F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
    )


def dup_components(pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b",
                   max_iter: int = 15,
                   driver_cutoff: int = 500_000) -> DataFrame:
    """Connected components over a duplicate-pair table → (id, component)
    with component = min id reachable — the step that turns pair output
    into actual dedup decisions (keep one representative per component).

    Iterative min-label propagation in pure DataFrame ops: each round is
    one join + aggregation (shuffle on id), and the loop exits as soon as
    no label changes — the standard large-graph components recipe when a
    graph library isn't part of the stack. Near-dup graphs are
    shallow-diameter (duplicates of a page form cliques through the
    banding), so convergence is a handful of rounds; ``max_iter`` bounds
    adversarial chains. Deterministic."""
    from pyspark.sql import functions as F

    # materialize the DIRECTED pairs first (r6): the symmetrization union
    # references the pair pipeline twice, and Catalyst plans the two
    # branches as independent subtrees — without this checkpoint the whole
    # upstream pair computation (LSH bucketing + verification) ran twice
    # per action before the union's distinct. Checkpointing fwd runs it
    # once; the union/distinct then operates on the (small) edge list.
    fwd = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    fwd = fwd.localCheckpoint(eager=True)
    edges = fwd.unionByName(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    # materialize ONCE more: every iteration (and the driver path) reuses
    # the deduped symmetric edge list
    edges = edges.localCheckpoint(eager=True)
    # size-gated hybrid (the GraphFrames/connected-components recipe):
    # below the cutoff the whole graph is a few MB — union-find on the
    # driver answers in milliseconds, where the iterative loop would pay
    # per-round scheduler latency (observed 0.3-2 s/round under host
    # jitter) on a milliseconds-sized problem. Above the cutoff (the
    # actual at-scale case: billions of pair edges) the distributed
    # min-label loop below is the path — same labels either way
    # (component = min reachable id), same DuckDB oracle.
    n_edges = edges.count()
    if n_edges <= driver_cutoff:
        # fetch via Arrow toPandas: ONE job and a columnar transfer
        # (toLocalIterator ran a sequential job per partition — ~2 s of
        # scheduler latency for a milliseconds-sized fetch); ≤500k edges
        # ≈ a few MB of int64 columns on the driver
        pdf = edges.toPandas()
        rows = list(zip(pdf["src"].tolist(), pdf["dst"].tolist()))
        parent: dict = {}

        def find(x):
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(x, x) != root:
                parent[x], x = root, parent[x]
            return root

        for src, dst in rows:
            ra, rb = find(src), find(dst)
            if ra != rb:
                # union by MIN id so the representative is deterministic
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        ids = sorted({src for src, _ in rows})
        out = [(i, find(i)) for i in ids]
        id_type = edges.schema["src"].dataType.simpleString()
        return edges.sparkSession.createDataFrame(
            out, schema=f"id {id_type}, component {id_type}")
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
    )
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.src == labels.id)
            .groupBy(F.col("dst").alias("id2"))
            .agg(F.min("component").alias("nmin"))
        )
        updated = (
            labels.join(neighbor_min, labels.id == neighbor_min.id2, "left")
            .select(
                "id",
                F.least(F.col("component"),
                        F.coalesce(F.col("nmin"), F.col("component"))
                        ).alias("component"),
                (F.coalesce(F.col("nmin"), F.col("component"))
                 < F.col("component")).alias("_changed"),
            )
        )
        updated = updated.localCheckpoint(eager=True)
        n_changed = updated.filter(F.col("_changed")).count()
        labels = updated.drop("_changed")
        if n_changed == 0:
            break
    return labels
