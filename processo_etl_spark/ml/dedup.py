"""Document deduplication at scale: exact, MinHash+LSH, SimHash, n-gram
Jaccard.

Design for 100 TB:

- Exact dedup = hash → groupBy(hash) — one shuffle on a 128-bit key,
  map-side combinable.
- Near-dup never compares all pairs: MinHash signatures are computed
  per-row (narrow), LSH banding turns similarity search into an
  equi-join on (band_index, band_hash) — Spark's bread-and-butter
  shuffle join — and only bucket-mates are verified with exact Jaccard.
- All hashes are md5-prefix integers (deterministic, engine-portable,
  no JVM-specific murmur seeds) so results are reproducible anywhere
  and oracle-comparable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def md5_long(c: Column) -> Column:
    """Deterministic 60-bit integer hash: first 15 hex chars of md5."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def normalize_text(c: Column | str) -> Column:
    """Canonical form for fingerprinting: lowercase, collapsed whitespace."""
    col = F.col(c) if isinstance(c, str) else c
    return F.lower(F.regexp_replace(F.trim(col), r"\s+", " "))


def fingerprint(c: Column | str) -> Column:
    """128-bit content fingerprint of normalized text (hex string)."""
    return F.md5(normalize_text(c))


def exact_dedup(
    df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """Exact dedup: keep the min-id row per content fingerprint.

    One shuffle on the fingerprint; survivors + duplicate counts.
    """
    return (
        df.withColumn("fp", fingerprint(text_col))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias(id_col),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def chunk_dedup(
    df: DataFrame,
    text_col: str,
    id_col: str,
    chunk_tokens: int = 10,
) -> DataFrame:
    """C4/CCNet-style sub-document dedup: split each document into
    consecutive ``chunk_tokens``-word chunks, keep only the globally
    FIRST occurrence of each chunk (ordered by (doc, position)), and
    reassemble the cleaned text.  Catches boilerplate paragraphs that
    whole-document dedup misses.

    Plan: narrow chunking (sequence + slice HOFs, no explode shuffle
    cost beyond the rows themselves) → posexplode → ONE shuffle
    partitioned by the chunk content to rank occurrences → groupBy doc
    to reassemble.  The corpus crosses the wire exactly twice (rank +
    regroup), each time as (id, pos, chunk) rows — no all-pairs work, no
    driver state, so the plan holds at 100 TB.  The occurrence rank is a
    per-chunk window (partitioned — bounded state per key), never a
    global window.

    Returns one row per document: n_chunks, n_kept, clean_text.
    """
    tk = normalize_text(text_col)
    toks = F.split(tk, " ")
    n_chunks = F.ceil(F.size(toks) / F.lit(chunk_tokens)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(
            F.slice(toks, i * chunk_tokens + 1, chunk_tokens), " "
        ),
    )
    exploded = df.select(
        F.col(id_col), F.posexplode(chunks).alias("pos", "chunk")
    )
    w = Window.partitionBy("chunk").orderBy(id_col, "pos")
    flagged = exploded.withColumn("kept", F.row_number().over(w) == 1)
    kept_struct = F.when(
        F.col("kept"), F.struct(F.col("pos"), F.col("chunk"))
    )
    return (
        flagged.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(F.col("kept").cast("long")).alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(kept_struct)),
                    lambda s: s["chunk"],
                ),
                " ",
            ).alias("clean_text"),
        )
    )


def boilerplate_chunk_removal(
    df: DataFrame,
    text_col: str,
    id_col: str,
    chunk_tokens: int = 10,
    min_docs: int = 2,
    toks_col: str | None = None,
) -> DataFrame:
    """CCNet/RefinedWeb-style boilerplate excision: drop EVERY
    occurrence of any ``chunk_tokens``-word chunk that appears in at
    least ``min_docs`` distinct documents (nav bars, cookie banners,
    license footers).  Complements ``chunk_dedup``, which keeps the
    first occurrence — boilerplate is noise in its first document too.

    Plan: the same narrow chunking as ``chunk_dedup`` → ONE
    content-keyed shuffle computing each chunk's document frequency
    (two-stage distinct-count, map-side partials) → the boilerplate
    chunk set (repeated chunks only — corpus × duplication-rate, slim)
    comes back via a left join on the chunk key → groupBy doc to
    reassemble.  No all-pairs work, no global window; at 100 TB the
    df-table join stays an equi-join on the content hash and the
    boilerplate relation is orders of magnitude smaller than the
    corpus.

    Returns one row per document: n_chunks, n_dropped, clean_text.
    """
    toks = (
        F.col(toks_col)
        if toks_col
        else F.split(normalize_text(text_col), " ")
    )
    n_chunks = F.ceil(F.size(toks) / F.lit(chunk_tokens)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(
            F.slice(toks, i * chunk_tokens + 1, chunk_tokens), " "
        ),
    )
    # Materialized once: the document-frequency aggregation and the
    # flag join otherwise each re-run the normalize/split/chunk HOF
    # pipeline over the whole corpus.
    exploded = df.select(
        F.col(id_col), F.posexplode(chunks).alias("pos", "chunk")
    ).persist()
    boiler = (
        exploded.groupBy("chunk")
        .agg(F.count_distinct(F.col(id_col)).alias("df_docs"))
        .filter(F.col("df_docs") >= F.lit(min_docs))
        .select("chunk", F.lit(True).alias("_boiler"))
    )
    flagged = exploded.join(boiler, "chunk", "left").withColumn(
        "kept", F.col("_boiler").isNull()
    )
    kept_struct = F.when(F.col("kept"), F.struct(F.col("pos"), F.col("chunk")))
    return (
        flagged.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum((~F.col("kept")).cast("long")).alias("n_dropped"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(kept_struct)),
                    lambda s: s["chunk"],
                ),
                " ",
            ).alias("clean_text"),
        )
    )


def word_shingles(
    text_col: Column | str, n: int = 3, toks: Column | None = None
) -> Column:
    """Word n-gram shingles as an array<string> — pure array expressions.

    tokens[i..i+n-1] for i in 1..len-n+1; rows shorter than n yield the
    whole text as a single shingle so they still participate.  Pass a
    precomputed ``toks`` array (the plans/common.corpus tokenize-once
    relation) to skip the normalize+split here — identical values by
    construction.
    """
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    toks = F.split(normalize_text(col), " ") if toks is None else toks

    # Bind the token array ONCE as a lambda value: higher-order functions
    # bypass codegen subexpression elimination, so referencing the
    # split/normalize subtree inside the per-shingle lambda would re-run
    # the regex pipeline ~3·|shingles| times per row (measured 20×
    # slowdown at sf0.1).  transform over a 1-element array is the
    # expression-level `let`.
    def make(tk: Column) -> Column:
        idx = F.sequence(F.lit(1), F.greatest(F.size(tk) - (n - 1), F.lit(1)))
        # try_element_at: rows with < n tokens read past the end — NULL
        # (skipped by concat_ws) matches DuckDB's out-of-bounds list index,
        # where plain element_at throws under ANSI semantics.
        return F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", *[F.try_element_at(tk, i + j) for j in range(n)]
            ),
        )

    return F.element_at(F.transform(F.array(toks), make), 1)


# Universal-hash family over one md5 per shingle: h = md5_long(s) % P, then
# family i is (A[i]*h + B[i]) % P with P = 2^31-1 (Mersenne).  One md5 per
# shingle total (not per family) — the k families are integer arithmetic,
# fully mirrored in the DuckDB oracle.  A[i]*h < 2^62 fits in int64.
MERSENNE_P = (1 << 31) - 1


def perm_constants(k: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for k affine hash families (a odd, nonzero)."""
    out = []
    for i in range(k):
        a = ((i + 1) * 2654435761) % MERSENNE_P | 1
        b = ((i + 1) * 40503) % MERSENNE_P
        out.append((a, b))
    return out


def shingle_hashes(shingles: Column) -> Column:
    """One 31-bit base hash per shingle: md5_long(s) % P (single md5 pass)."""
    return F.transform(shingles, lambda s: md5_long(s) % F.lit(MERSENNE_P))


def minhash_signature(shingles: Column, k: int = 16) -> Column:
    """k independent min-hashes via affine permutations of one base hash.

    A single ``aggregate`` pass: the base hash ``h`` binds once as the
    lambda value, so each shingle pays ONE md5 plus k integer ops.
    (Higher-order functions bypass codegen subexpression elimination, so
    k separate ``array_min(transform(...))`` trees would recompute the
    md5 pass k times.)  Per-row and narrow — no shuffle; at 100 TB this
    is |shingles| md5 calls per row, not k·|shingles|.
    """
    consts = perm_constants(k)

    def merge(acc: Column, h: Column) -> Column:
        fams = F.array(
            *[(h * F.lit(a) + F.lit(b)) % F.lit(MERSENNE_P) for a, b in consts]
        )
        return F.zip_with(acc, fams, lambda x, y: F.least(x, y))

    init = F.array_repeat(F.lit(MERSENNE_P).cast("long"), k)
    return F.aggregate(shingle_hashes(shingles), init, merge)


def _band_hash(sig: Column, band: int, rows_per_band: int) -> Column:
    start = band * rows_per_band + 1  # slice is 1-based
    return F.md5(
        F.concat_ws(",", *[
            F.element_at(sig, start + j).cast("string") for j in range(rows_per_band)
        ])
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    threshold: float = 0.5,
    toks_col: str | None = None,
) -> DataFrame:
    """Near-duplicate pairs via MinHash + LSH banding + exact verify.

    1. signature: k minhashes per doc (narrow map).
    2. banding: b bands of k/b rows; docs sharing any band hash are
       candidates — an equi-join on (band, band_hash), never all-pairs.
    3. verify: exact Jaccard over distinct shingle sets ≥ threshold.

    Returns (id_a, id_b, jaccard) with id_a < id_b.
    """
    rows_per_band = k // bands
    tk = F.col(toks_col) if toks_col else None
    base = df.select(
        F.col(id_col).alias("doc"),
        F.array_distinct(word_shingles(text_col, shingle_n, toks=tk)).alias("sh"),
    ).withColumn("sig", minhash_signature(F.col("sh"), k))
    # The self-join + verify re-read this lineage 4×; materialize once.
    # At cluster scale this would be a parquet signature table instead.
    base = base.persist()

    banded = base.select(
        "doc",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    _band_hash(F.col("sig"), b, rows_per_band).alias("bh"),
                )
                for b in range(bands)
            ])
        ).alias("lsh"),
    ).select("doc", "lsh.band", "lsh.bh")

    # Candidate generation joins ONLY (doc, band, bh) — shingle arrays never
    # enter this shuffle; they are re-attached per surviving pair below.
    left = banded.select(F.col("doc").alias("id_a"), "band", "bh")
    right = banded.select(F.col("doc").alias("id_b"), "band", "bh")
    cand = (
        left.join(right, on=["band", "bh"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    shingle_sets = base.select("doc", "sh")
    pairs = cand.join(
        shingle_sets.select(F.col("doc").alias("id_a"), F.col("sh").alias("sh_a")),
        on="id_a",
    ).join(
        shingle_sets.select(F.col("doc").alias("id_b"), F.col("sh").alias("sh_b")),
        on="id_b",
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    jac = inter.cast("double") / union.cast("double")
    return (
        pairs.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def connected_components(
    pairs: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iterations: int = 20,
) -> DataFrame:
    """Duplicate CLUSTERS from near-dup pairs: connected components via
    min-label propagation.

    Each node's label converges to the minimum id reachable from it;
    one `groupBy(node).min(label)` + one join per round, O(log D)
    rounds for graph diameter D (dup clusters are tiny — a handful of
    rounds).  The loop is driver-side but every step is distributed;
    ``localCheckpoint`` truncates the growing lineage each round.

    Returns (doc, cluster) where cluster = min doc id of the component
    — the canonical survivor for keep-one dedup.
    """
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .union(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("doc"))
        .distinct()
        .withColumn("cluster", F.col("doc"))
    )
    for _ in range(max_iterations):
        # Propagate: each node adopts min(own label, neighbors' labels).
        neighbor_min = (
            edges.join(labels, edges["dst"] == labels["doc"])
            .groupBy("src")
            .agg(F.min("cluster").alias("nbr_cluster"))
        )
        new_labels = (
            labels.join(neighbor_min, labels["doc"] == neighbor_min["src"], "left")
            .select(
                "doc",
                F.least(
                    F.col("cluster"), F.coalesce(F.col("nbr_cluster"), F.col("cluster"))
                ).alias("cluster"),
            )
        )
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), on="doc")
            .filter(F.col("n.cluster") != F.col("o.cluster"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist()
    return labels


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_col: str,
    shingle_n: int = 3,
    threshold: float = 0.3,
) -> DataFrame:
    """Blocked exact n-gram Jaccard: all pairs *within a blocking key*.

    The block join keeps the candidate set linear-ish (never global
    all-pairs); use MinHash-LSH when no natural blocking key exists.
    """
    base = df.select(
        F.col(block_col).alias("blk"),
        F.col(id_col).alias("doc"),
        F.array_distinct(word_shingles(text_col, shingle_n)).alias("sh"),
    )
    a = base.select("blk", F.col("doc").alias("id_a"), F.col("sh").alias("sh_a"))
    b = base.select("blk", F.col("doc").alias("id_b"), F.col("sh").alias("sh_b"))
    pairs = a.join(b, on="blk").filter(F.col("id_a") < F.col("id_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    jac = inter.cast("double") / union.cast("double")
    return (
        pairs.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def ngram_containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_col: str,
    shingle_n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Blocked n-gram CONTAINMENT: pairs where the smaller document's
    shingle set is ≥ ``threshold`` contained in the other's —
    containment(A→B) = |A∩B| / |A|.

    Why it's a separate operator from Jaccard: a short document quoted
    verbatim inside a long one has containment ≈ 1 but Jaccard ≈
    |A|/|B| ≈ 0 — symmetric similarity NEVER finds quote/excerpt
    duplication (Lee et al. 2022 §4 discuss exactly this asymmetry).
    Emits both directions' containments plus Jaccard so the caller can
    distinguish excerpt (high max_containment, low jaccard) from
    near-dup (both high).

    Scale shape: identical to ``ngram_jaccard_pairs`` — block equi-join
    bounds candidates to Σ_b |b|², one array_intersect per candidate;
    compose with MinHash banding when no blocking key exists.
    """
    base = df.select(
        F.col(block_col).alias("blk"),
        F.col(id_col).alias("doc"),
        F.array_distinct(word_shingles(text_col, shingle_n)).alias("sh"),
    )
    a = base.select("blk", F.col("doc").alias("id_a"), F.col("sh").alias("sh_a"))
    b = base.select("blk", F.col("doc").alias("id_b"), F.col("sh").alias("sh_b"))
    pairs = a.join(b, on="blk").filter(F.col("id_a") < F.col("id_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    c_ab = inter.cast("double") / F.size("sh_a").cast("double")
    c_ba = inter.cast("double") / F.size("sh_b").cast("double")
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        pairs.withColumn("containment_ab", c_ab)
        .withColumn("containment_ba", c_ba)
        .withColumn(
            "jaccard", inter.cast("double") / union.cast("double")
        )
        .filter(
            F.greatest("containment_ab", "containment_ba") >= F.lit(threshold)
        )
        .select("id_a", "id_b", "containment_ab", "containment_ba", "jaccard")
    )


def prefix_filter_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """EXACT all-pairs Jaccard join via prefix filtering — the
    SSJoin/PPJoin family (Chaudhuri et al. ICDE'06; Xiao et al.
    WWW'08), the deterministic complement to MinHash-LSH: zero false
    negatives by construction instead of probabilistic recall.

    Pigeonhole guarantee: order every set by a GLOBAL total order
    (ascending document frequency, rarest first — ties by token); for
    Jaccard ≥ t, a pair must share at least one token within each
    side's PREFIX of length |s| − ⌈t·|s|⌉ + 1 (if the prefixes were
    disjoint, the overlap is too small to reach t).  So an equi-join on
    prefix tokens finds EVERY qualifying pair, and the exact verify
    makes precision 1 — the output is identical to the naive all-pairs
    join, which is exactly what the DuckDB oracle computes.

    Plan shape: shingle doc-frequency (1 shuffle) → df-attach + per-doc
    (df, token)-sort (explode + vocab join + groupBy) → candidate
    equi-join on the exploded prefix (rarest-token blocking: fan-out is
    bounded by token df, and the rarest tokens have the smallest df) →
    slim verify re-attach, as in MinHash.  At 100 TB the prefix join is
    the cost and it is linear in Σ df(prefix tokens) — the reason the
    frequency order matters: prefixes hold the RAREST tokens.
    """
    base = df.select(
        F.col(id_col).alias("doc"),
        F.array_distinct(word_shingles(text_col, shingle_n)).alias("sh"),
    )
    ex = base.select("doc", F.explode("sh").alias("tok"))
    dfreq = ex.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    # Per-doc token list sorted by the global (df, tok) order; struct
    # sort gives the total order, then we keep the token strings.
    ordered = (
        ex.join(dfreq, on="tok")
        .groupBy("doc")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("df", "tok"))),
                lambda s: s["tok"],
            ).alias("toks")
        )
    )
    prefix_len = (
        F.size("toks") - F.ceil(F.lit(threshold) * F.size("toks")) + 1
    ).cast("int")
    prefixes = ordered.select(
        "doc",
        F.size("toks").alias("sz"),
        F.explode(F.slice("toks", 1, prefix_len)).alias("tok"),
    )
    # Length filter (the PPJoin companion prune): Jaccard ≥ t forces
    # t·|A| ≤ |B| ≤ |A|/t, checked ON the token join before the
    # dedup/verify — cut verified candidates 409k → 310k (−24%) at
    # sf0.1 on this worst-case (shared-vocab, high-df) corpus; on
    # Zipfian text the prefix+length pair prunes far harder.
    cand = (
        prefixes.alias("a")
        .join(prefixes.alias("b"), on="tok")
        .filter(
            (F.col("a.doc") < F.col("b.doc"))
            & (F.col("b.sz") >= F.lit(threshold) * F.col("a.sz"))
            & (F.col("a.sz") >= F.lit(threshold) * F.col("b.sz"))
        )
        .select(
            F.col("a.doc").alias("id_a"), F.col("b.doc").alias("id_b")
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    sets = base.select("doc", "sh")
    pairs = cand.join(
        sets.select(F.col("doc").alias("id_a"), F.col("sh").alias("sh_a")),
        on="id_a",
    ).join(
        sets.select(F.col("doc").alias("id_b"), F.col("sh").alias("sh_b")),
        on="id_b",
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    jac = inter.cast("double") / union.cast("double")
    return (
        pairs.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash64(tokens: Column) -> Column:
    """64-bit SimHash of a token array — pure expressions, no UDF.

    For each bit i: sum over tokens of (+1 if bit set in md5_long(token)
    else -1); bit i of the result = (sum > 0).  Near-dups have small
    Hamming distance between signatures.

    Note: md5_long yields 60 bits (15 hex chars), so bits 60-63 are
    always 'unset' votes; with 60 informative bits the signature keeps
    its locality properties (documented deviation from a full 64).
    """
    th = F.transform(tokens, md5_long)

    # ONE aggregate pass with a 60-wide vote vector (HOFs bypass codegen
    # CSE, so 60 separate aggregates would re-hash every token 60×).  The
    # token hash ``h`` binds once per element; votes fold into the final
    # signature via a let-bound zip with the bit-weight array.
    def merge(acc: Column, h: Column) -> Column:
        bits = F.array(
            *[
                F.when(h.bitwiseAND(F.lit(1 << i)) != 0, 1).otherwise(-1)
                for i in range(60)
            ]
        )
        return F.zip_with(acc, bits, lambda a, b: a + b)

    votes = F.aggregate(th, F.array_repeat(F.lit(0), 60), merge)
    weights = F.array(*[F.lit(1 << i).cast("long") for i in range(60)])

    def fold(v: Column) -> Column:
        contrib = F.zip_with(
            v, weights, lambda x, w: F.when(x > 0, w).otherwise(F.lit(0).cast("long"))
        )
        return F.aggregate(contrib, F.lit(0).cast("long"), lambda a, x: a + x)

    return F.element_at(F.transform(F.array(votes), fold), 1)


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit signatures (bit_count of xor)."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 8,
    prefix_bits: int = 12,
) -> DataFrame:
    """SimHash near-dup pairs, blocked by the top signature bits.

    Single-prefix blocking is FAST but approximate: pairs whose
    differing bits straddle the prefix are missed.  For the
    guaranteed-recall scale path use ``simhash_dedup_pairs_banded``
    (pigeonhole over max_hamming+1 bands).
    """
    base = df.select(
        F.col(id_col).alias("doc"),
        simhash64(F.split(normalize_text(text_col), " ")).alias("sig"),
    ).withColumn("blk", F.shiftright("sig", 60 - prefix_bits))
    # Materialize once: the self-join would otherwise run the signature
    # lineage twice (and project-collapse re-inlines `sig` into `blk`).
    base = base.persist()
    a = base.select(F.col("doc").alias("id_a"), F.col("sig").alias("sig_a"), "blk")
    b = base.select(F.col("doc").alias("id_b"), F.col("sig").alias("sig_b"), "blk")
    return (
        a.join(b, on="blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", hamming64(F.col("sig_a"), F.col("sig_b")))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def _band_layout(sig_bits: int, n_bands: int) -> list[tuple[int, int, int]]:
    """(band, shift, mask) triples splitting ``sig_bits`` into ``n_bands``
    contiguous bands, widest first."""
    widths = [
        sig_bits // n_bands + (1 if i < sig_bits % n_bands else 0)
        for i in range(n_bands)
    ]
    out, shift = [], 0
    for band, w in enumerate(widths):
        out.append((band, shift, (1 << w) - 1))
        shift += w
    return out


def simhash_dedup_pairs_banded(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 8,
) -> DataFrame:
    """SimHash near-dup pairs with GUARANTEED recall at ``max_hamming``.

    Pigeonhole (Manku et al., WWW'07 fingerprint blocking, generalized):
    split the 60-bit signature into ``max_hamming + 1`` contiguous
    bands; a pair differing in ≤ max_hamming bits can corrupt at most
    max_hamming bands, so it agrees EXACTLY on at least one — an
    equi-join on (band, band_value) finds every such pair.  (VERDICT r3
    suggested 4 rotated 16-bit prefix tables, but 4 tables pigeonhole
    only hamming ≤ 3; hamming ≤ 8 needs 9 bands.)

    Scale shape: signatures are computed once (one narrow fold per doc,
    persisted), exploded 9× into (band, val) keys, self-equi-joined —
    never all-pairs.  Cost vs the single-prefix variant: 9× key rows
    and ~6-7-bit band keys, so band-join fan-out is the price of exact
    recall; at 100 TB compose with a coarse blocking key (e.g. length
    bucket or language) or drop to ``simhash_dedup_pairs`` where
    approximate recall is acceptable.
    """
    base = df.select(
        F.col(id_col).alias("doc"),
        simhash64(F.split(normalize_text(text_col), " ")).alias("sig"),
    ).persist()
    return banded_hamming_pairs(base, sig_bits=60, max_hamming=max_hamming)


def banded_hamming_pairs(
    base: DataFrame, sig_bits: int, max_hamming: int
) -> DataFrame:
    """Exact-recall Hamming-neighbor pairs over a ``(doc, sig)`` relation.

    The signature-agnostic core of ``simhash_dedup_pairs_banded`` —
    same pigeonhole guarantee (split ``sig_bits`` into ``max_hamming+1``
    bands; a pair within ``max_hamming`` agrees exactly on ≥ 1 band, so
    the (band, value) equi-join finds every such pair), reusable for
    any ≤64-bit fingerprint: 60-bit text SimHash, 56-bit image dHash
    (``ml/multimodal.image_dhash``), …  Callers persist ``base`` when
    its lineage is expensive (the self-join evaluates it twice
    otherwise).  Never all-pairs; scale notes on the SimHash wrapper.
    """
    layout = _band_layout(sig_bits, max_hamming + 1)
    bands = F.array(
        *[
            F.struct(
                F.lit(band).alias("band"),
                F.shiftright("sig", shift).bitwiseAND(F.lit(mask)).alias("val"),
            )
            for band, shift, mask in layout
        ]
    )
    ex = base.select("doc", "sig", F.explode(bands).alias("bv")).select(
        "doc", "sig", F.col("bv.band").alias("band"), F.col("bv.val").alias("val")
    )
    a = ex.select(
        F.col("doc").alias("id_a"), F.col("sig").alias("sig_a"), "band", "val"
    )
    b = ex.select(
        F.col("doc").alias("id_b"), F.col("sig").alias("sig_b"), "band", "val"
    )
    return (
        a.join(b, on=["band", "val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", hamming64(F.col("sig_a"), F.col("sig_b")))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
        .distinct()
    )


def _positional_grams(
    df: DataFrame, text_col: str, id_col: str, n: int, toks_col: str | None = None
) -> DataFrame:
    """(doc_id, pos, g): word n-grams with their 1-based start position."""
    tk = F.col(toks_col) if toks_col else None
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(word_shingles(F.col(text_col), n, toks=tk)).alias("pos0", "g"),
    ).select("doc_id", (F.col("pos0") + 1).cast("long").alias("pos"), "g")


def _dup_gram_keys(grams: DataFrame, min_docs: int) -> DataFrame:
    """Grams occurring in ≥ min_docs distinct docs — the shuffle that
    finds cross-document repetition."""
    if min_docs == 2:
        # "≥2 distinct docs" ⟺ min(doc) ≠ max(doc): min/max partial-
        # aggregate map-side for pennies, where count_distinct builds a
        # per-gram hash set before it can combine.  Measured 15–20%
        # off the whole operator at sf0.1.
        return (
            grams.groupBy("g")
            .agg(F.min("doc_id").alias("_mn"), F.max("doc_id").alias("_mx"))
            .filter(F.col("_mn") != F.col("_mx"))
            .select("g")
        )
    return (
        grams.groupBy("g")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("g")
    )


def duplicate_spans(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    min_docs: int = 2,
    toks_col: str | None = None,
) -> DataFrame:
    """Exact duplicate TEXT-SPAN detection — word-granular ExactSubstr
    (Lee et al. 2022, "Deduplicating Training Data Makes Language Models
    Better"): the maximal runs of token positions whose word n-gram
    occurs in ≥ ``min_docs`` distinct documents.  Finer-grained than
    ``chunk_dedup`` (fixed blocks): spans start and end exactly where
    the cross-document repetition does, so a downstream pass can excise
    boilerplate without clipping unique text.

    Returns (doc_id, span_start, span_end, n_dup_grams), token-indexed
    (1-based, inclusive).

    Plan shape — two slim shuffles, never all-pairs: positional shingle
    (narrow, PERSISTED — both the doc-frequency branch and the hits
    re-join read it, and Spark caches partitions as the first branch
    computes them, so even a single cold action pays the explode once;
    measured 3× off the whole operator at sf0.1) → one shuffle on the
    gram for a partial-aggregated distinct-doc count → hits re-join
    (the dup-gram side is the filtered minority) → ONE groupBy(doc_id)
    shuffle collecting each doc's hit positions, merged into maximal
    token spans by a sorted left fold (``F.aggregate``): two gram
    starts whose gap is ≤ n cover overlapping-or-touching token ranges,
    so the fold closes a span only when ``pos - prev > n`` (a plain
    ``pos - row_number()`` grouping would emit overlapping spans for
    starts that are near but not adjacent).  The fold replaces the
    previous lag()+running-sum window pair, whose doc_id repartition +
    sort + SECOND groupBy shuffle measured ~20% slower; per-doc list
    size is bounded by document length — the bound the text column
    itself already imposes on a row.
    At 100 TB the gram join is the cost; its key is content-hashed and
    uniform, and the hits relation is corpus-size × duplication-rate,
    not quadratic.  The persist becomes a materialized gram table at
    cluster scale (MEMORY_AND_DISK spills rather than OOMs); there,
    also switch the join key to ``md5_long(g)`` to cut shuffle bytes
    ~2.5× (not worth it at bench scale where grams are ~20 bytes).
    """
    grams = _positional_grams(df, text_col, id_col, n, toks_col).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    dup = _dup_gram_keys(grams, min_docs)
    return (
        grams.join(dup, on="g")
        .groupBy("doc_id")
        .agg(_merge_positions_to_spans(n).alias("spans"))
        .select("doc_id", F.explode("spans").alias("sp"))
        .select("doc_id", "sp.span_start", "sp.span_end", "sp.n_dup_grams")
    )


def _merge_positions_to_spans(n: int) -> Column:
    """Fold a doc's sorted dup-gram start positions into maximal token
    spans: array<struct<span_start, span_end, n_dup_grams>>.

    Pure JVM higher-order fold over ``sort_array(collect_list(pos))`` —
    no window, no second shuffle.  The accumulator carries the closed
    spans plus the open span's (start, prev-start, gram-count); the
    finisher closes the last span.  ``span_end = prev + n - 1`` (the
    last token the final gram covers), matching the window formulation
    bit-for-bit (differential-tested against it).
    """
    ps = F.sort_array(F.collect_list("pos"))
    init = F.struct(
        F.array()
        .cast("array<struct<span_start:long,span_end:long,n_dup_grams:long>>")
        .alias("spans"),
        F.lit(-1).cast("long").alias("s"),
        F.lit(-1).cast("long").alias("prev"),
        F.lit(0).cast("long").alias("c"),
    )

    def closed(acc):
        return F.concat(
            acc.spans,
            F.array(
                F.struct(
                    acc.s.alias("span_start"),
                    (acc.prev + n - 1).alias("span_end"),
                    acc.c.alias("n_dup_grams"),
                )
            ),
        )

    def step(acc, p):
        fresh = F.struct(
            acc.spans.alias("spans"),
            p.alias("s"),
            p.alias("prev"),
            F.lit(1).cast("long").alias("c"),
        )
        extend = F.struct(
            acc.spans.alias("spans"),
            acc.s.alias("s"),
            p.alias("prev"),
            (acc.c + 1).alias("c"),
        )
        close_open = F.struct(
            closed(acc).alias("spans"),
            p.alias("s"),
            p.alias("prev"),
            F.lit(1).cast("long").alias("c"),
        )
        return (
            F.when(acc.c == 0, fresh)
            .when(p - acc.prev <= n, extend)
            .otherwise(close_open)
        )

    def fin(acc):
        return F.when(acc.c == 0, acc.spans).otherwise(closed(acc))

    return F.aggregate(ps, init, step, fin)


def excise_duplicate_spans(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    min_docs: int = 2,
    toks_col: str | None = None,
) -> DataFrame:
    """Remove cross-document duplicated spans from the text — the
    excision half of ExactSubstr dedup (Lee et al. 2022): every token
    covered by a word n-gram that occurs in ≥ ``min_docs`` distinct
    documents is dropped; the survivors are re-joined in order.

    Returns (doc_id, clean_text, n_tokens_kept, n_tokens_removed); a
    fully-boilerplate document survives as an empty ``clean_text`` row
    rather than vanishing, so downstream counts reconcile.

    Plan shape (r14): the same gram doc-frequency shuffle as
    :func:`duplicate_spans` (grams likewise PERSISTED — the frequency
    branch and the hit branch both read them), then the dup-gram START
    positions aggregate per doc (one shuffle carrying ONLY hit rows —
    corpus-size × duplication-rate) and the excision itself happens
    ARRAY-LOCALLY on the token array: covered positions expand n-ways
    inside the row, ``array_except(sequence(1, len), covered)`` keeps
    the survivors in order (hash-set difference — linear in document
    length, not len×hits), and the survivors re-assemble with one
    ``transform`` + ``concat_ws``.  This replaces the previous
    token-STREAM plan — posexplode of every token, a LEFT ANTI join of
    all tokens against the exploded covered positions, and a
    collect-and-sort re-assembly shuffle of every (pos, token) struct —
    whose two heavy exchanges moved the whole corpus token-by-token;
    the only corpus-wide relations now shuffled are grams (already
    required for doc-frequency) and the hit starts.  Per-row state is
    bounded by document length, the same bound the text column itself
    already imposes.
    """
    words = F.split(normalize_text(text_col), " ")
    base = df.select(F.col(id_col).alias("doc_id"), words.alias("w"))
    grams = _positional_grams(df, text_col, id_col, n, toks_col).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    dup = _dup_gram_keys(grams, min_docs)
    starts = (
        grams.join(dup, on="g")
        .groupBy("doc_id")
        .agg(F.collect_list("pos").alias("starts"))
    )
    covered = F.array_distinct(
        F.flatten(
            F.transform(
                F.col("starts"),
                lambda s: F.sequence(s, s + F.lit(n - 1)),
            )
        )
    )
    # NULL-text guard: size(NULL) is -1 and Spark's sequence(1, -1)
    # DESCENDS, so an unguarded kept_pos would read [1, 0, -1] for a
    # NULL text; the empty array preserves the previous plan's exact
    # output for that row (no tokens kept, clean_text '').
    kept_pos = F.when(
        F.col("w").isNull(), F.array().cast("array<long>")
    ).otherwise(
        F.array_except(
            F.sequence(F.lit(1).cast("long"), F.size("w").cast("long")),
            F.coalesce(covered, F.array().cast("array<long>")),
        )
    )
    return (
        base.join(starts, on="doc_id", how="left")
        .select(
            "doc_id",
            F.concat_ws(
                " ",
                F.transform(
                    kept_pos, lambda p: F.element_at(F.col("w"), p.cast("int"))
                ),
            ).alias("clean_text"),
            F.size(kept_pos).cast("long").alias("n_tokens_kept"),
            (F.size("w").cast("long") - F.size(kept_pos)).cast("long").alias(
                "n_tokens_removed"
            ),
        )
    )


def minhash_lsh_incremental(
    corpus: DataFrame,
    batch: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    bands: int = 2,
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Incremental dedup: match an APPEND BATCH against an existing
    corpus — the production daily-ingest shape.  Candidates only ever
    cross batch × corpus (an equi-join on (band, band_hash) between the
    two sides); the quadratic-ish within-corpus work happened once when
    the corpus was first deduplicated, and at cluster scale the
    corpus's banded signature relation is a persisted parquet "index"
    table that each day's batch probes.

    Returns one row per batch doc: (id, dup_of, jaccard) where
    ``dup_of`` is the LOWEST corpus id whose verified Jaccard ≥
    threshold (NULL for genuinely-new docs, which are safe to append).
    """

    def prep(d: DataFrame) -> DataFrame:
        return d.select(
            F.col(id_col).alias("doc"),
            F.array_distinct(word_shingles(text_col, shingle_n)).alias("sh"),
        ).withColumn("sig", minhash_signature(F.col("sh"), k))

    rows_per_band = k // bands

    def banded(base: DataFrame) -> DataFrame:
        return base.select(
            "doc",
            F.explode(
                F.array(*[
                    F.struct(
                        F.lit(b).alias("band"),
                        _band_hash(F.col("sig"), b, rows_per_band).alias("bh"),
                    )
                    for b in range(bands)
                ])
            ).alias("lsh"),
        ).select("doc", "lsh.band", "lsh.bh")

    corpus_base = prep(corpus).persist()
    batch_base = prep(batch).persist()
    cand = (
        banded(batch_base)
        .select(F.col("doc").alias("bid"), "band", "bh")
        .join(
            banded(corpus_base).select(F.col("doc").alias("cid"), "band", "bh"),
            on=["band", "bh"],
        )
        .select("bid", "cid")
        .dropDuplicates(["bid", "cid"])
    )
    pairs = cand.join(
        batch_base.select(F.col("doc").alias("bid"), F.col("sh").alias("sh_b")),
        on="bid",
    ).join(
        corpus_base.select(F.col("doc").alias("cid"), F.col("sh").alias("sh_c")),
        on="cid",
    )
    inter = F.size(F.array_intersect("sh_b", "sh_c"))
    union = F.size("sh_b") + F.size("sh_c") - inter
    verified = (
        pairs.withColumn("jaccard", inter.cast("double") / union.cast("double"))
        .filter(F.col("jaccard") >= threshold)
    )
    # Lowest matching corpus id per batch doc — min over (cid, jaccard)
    # structs is deterministic because cid is unique within a bid group.
    best = verified.groupBy("bid").agg(
        F.min(F.struct("cid", "jaccard")).alias("m")
    )
    return batch_base.select(F.col("doc").alias(id_col)).join(
        best.select(
            F.col("bid").alias(id_col),
            F.col("m.cid").alias("dup_of"),
            F.col("m.jaccard").alias("jaccard"),
        ),
        on=id_col,
        how="left",
    )


def cluster_representatives(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str,
    score_col: str,
) -> DataFrame:
    """Keep-one dedup: pick the best-scoring document per duplicate
    cluster (the step that turns pair/cluster output into an actual
    deduplicated corpus — RefinedWeb/C4-style "keep longest/best").

    ``pairs`` is any near-dup pair set (MinHash-LSH, SimHash, ...);
    clusters come from :func:`connected_components`.  Docs untouched by
    any pair are their own singleton cluster and always kept.  Winner =
    max ``score_col``, ties broken by min id — fully deterministic.

    Scale shape: components are O(log D) distributed rounds over the
    (tiny) pair graph only; the corpus-wide work is one left join on id
    (broadcastable — the cluster map is |pair-touched docs|, orders of
    magnitude smaller than the corpus) plus one window shuffle on
    cluster.  Skew-safe: a pathological mega-cluster is itself the
    signal to fix upstream thresholds, and the window state per cluster
    is one row_number counter, not a buffer.
    """
    clusters = connected_components(pairs).withColumnRenamed("doc", id_col)
    labeled = docs.join(F.broadcast(clusters), on=id_col, how="left").withColumn(
        "cluster", F.coalesce(F.col("cluster"), F.col(id_col))
    )
    w = Window.partitionBy("cluster").orderBy(
        F.col(score_col).desc(), F.col(id_col)
    )
    return labeled.select(
        id_col,
        "cluster",
        F.col(score_col),
        (F.row_number().over(w) == 1).alias("kept"),
    )
