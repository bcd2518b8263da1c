"""Corpus ingest composition: one call per admitted micro-batch.

The round-6/7 operators form a complete incremental-ingest story —
bipartite near-dup gates (dedup.minhash/simhash `_cross`,
similarity cross embedding near-dup), versioned-base merge
(streaming.batcher), incremental cluster-label maintenance
(cluster.components_update), and incremental ANN index maintenance
(similarity.ivf_append / srp_append / pq_append / sq8_append — the
whole persisted-index family, wired in via admit_batch's
index_paths). This module is the PRODUCT surface that
composes them: `admit_batch` runs the whole admission for one batch,
and `ingest_stream` mounts it on a Structured Streaming source via
foreachBatch, so a landing directory drains straight into a
dedup-gated, label-maintained, versioned corpus.

Crash safety inherits the versioned-base contract: each admission
writes NEW v{n+1} directories (corpus, and labels when maintained)
and flips the corpus `_LATEST` marker LAST, so a crash mid-admission
leaves the previous version fully intact and the streaming
checkpoint replays the batch against it. Labels are written before
the marker flip and keyed to the same version number, so a reader
never observes a corpus version whose labels are missing.

At 100 TB: every stage is the already-audited incremental shape —
the merge shuffles on the key once, label maintenance re-solves only
touched components, and the index append writes only touched cells.
The GATE has two modes: the raw mode hands gate_fn the corpus rows
(one corpus scan — and for media gates a corpus DECODE — per batch),
which is fine for bounded corpora but O(corpus) per micro-batch; the
FINGERPRINT SIDECAR mode (fingerprint_root, VERDICT r13 #1) gates
against a persisted fingerprint table seeded by init_ingest and
upserted at every commit, so corpus payloads are fingerprinted
exactly once, at write time, and per-batch gate cost is
O(batch + collisions). With the sidecar, per-batch cost is
O(batch + touched state), never O(corpus).

Reference parity note: the reference engine (ChapterhouseDB) ships
an ingest/merge loop for arrow records (SURVEY.md §2.1 inserters/);
this is its corpus-scale, dedup-gated generalization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _fingerprint_path(fingerprint_root: str, ver: int) -> str:
    """Sidecar version directory — same v{n:06d} naming as the corpus
    so corpus version N and its fingerprints travel under one number."""
    return f"{fingerprint_root}/v{ver:06d}"


def _fp_buckets_of(spark, fingerprint_root: str) -> int:
    """The sidecar's bucket count (its _BUCKETS marker; 0 = the plain
    whole-table layout). The root self-describes, so admit_batch and
    read_fingerprints need no layout parameter."""
    from chapterhousedb_spark.streaming.batcher import _read_marker_or

    return _read_marker_or(spark, fingerprint_root, "_BUCKETS", 0)


def _fp_bucket_col(id_col: str, buckets: int):
    return F.pmod(F.xxhash64(F.col(id_col)), F.lit(buckets)).cast("int")


def _fs_list_names(spark, path: str) -> list[str]:
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(jpath):
        return []
    return [st.getPath().getName() for st in fs.listStatus(jpath)]


def _fp_versions(spark, fingerprint_root: str) -> list[int]:
    return sorted(
        int(n[1:])
        for n in _fs_list_names(spark, fingerprint_root)
        if n.startswith("v") and n[1:].isdigit()
    )


def _fp_buckets_in(spark, fingerprint_root: str, ver: int) -> set[int]:
    return {
        int(n.split("=", 1)[1])
        for n in _fs_list_names(spark, _fingerprint_path(fingerprint_root, ver))
        if n.startswith("__b=")
    }


# per-version populated-bucket listings, keyed by fingerprint_root
# (ADVICE r14: without a cache every micro-batch's gate re-lists every
# sidecar version dir until vacuum runs — O(#versions) listings/batch
# on long streams). A committed version dir's bucket set is IMMUTABLE
# (only an uncommitted v+1 is ever rewritten, and callers only resolve
# versions <= the corpus marker), so entries never go stale; entries
# whose version vanished from a fresh root listing (a vacuum, possibly
# by another process) are dropped on reconciliation in
# _fp_buckets_map. Process-local, like the dedup self-join caches.
_FP_LISTING_CACHE: dict[str, dict[int, frozenset]] = {}


def _fp_buckets_map(
    spark,
    fingerprint_root: str,
    versions: list[int],
    live_versions: list[int] | None = None,
) -> dict[int, frozenset]:
    """{version: populated buckets} for the given COMMITTED sidecar
    versions, via the process-local listing cache: only versions not
    yet cached pay a filesystem listing. Reconciliation evicts cached
    versions absent from `live_versions` (the FULL fresh root listing
    — defaults to `versions`): a vacuumed dir drops out, while a
    time-travel read at an older version, whose `versions` is a
    filtered subset, cannot evict still-live newer entries (round-15
    review finding)."""
    cache = _FP_LISTING_CACHE.setdefault(fingerprint_root, {})
    live = set(versions if live_versions is None else live_versions)
    for v in [v for v in cache if v not in live]:
        del cache[v]
    for v in versions:
        if v not in cache:
            cache[v] = frozenset(_fp_buckets_in(spark, fingerprint_root, v))
    return {v: cache[v] for v in versions}


def _fp_resolution(
    spark, fingerprint_root: str, ver: int, buckets: int
) -> dict[int, int]:
    """{bucket: newest writer version <= ver} for every bucket that has
    one — the bucketed layout's read resolution. Listings are cached
    per committed version (see _FP_LISTING_CACHE), so a steady-state
    stream pays one root listing plus one listing per NEW version.
    Versions above `ver` (an uncommitted crash-attempt v+1) are never
    listed or cached — only the marker flip makes a dir immutable."""
    all_versions = _fp_versions(spark, fingerprint_root)
    versions = [v for v in all_versions if v <= ver]
    bmap = _fp_buckets_map(
        spark, fingerprint_root, versions, live_versions=all_versions
    )
    need = set(range(buckets))
    out: dict[int, int] = {}
    for v in sorted(versions, reverse=True):
        present = bmap[v] & need
        for k in present:
            out[k] = v
        need -= present
        if not need:
            break
    return out


def _read_fingerprints_at(
    spark, fingerprint_root: str, ver: int, buckets: int
) -> DataFrame:
    """Sidecar rows AS OF corpus version `ver`. Plain layout: one
    whole-table version dir. Bucketed layout (init_ingest
    fingerprint_buckets=B): each version dir holds only the buckets
    that commit TOUCHED, so bucket k's state at version V is its
    newest writer <= V — resolved from cached per-version listings
    (one filesystem listing per version over the whole process life,
    not per read), no manifest file needed. Reads address the __b=k
    leaf dirs directly (the partition column stays in the dir name,
    never in the data)."""
    if not buckets:
        return spark.read.parquet(_fingerprint_path(fingerprint_root, ver))
    res = _fp_resolution(spark, fingerprint_root, ver, buckets)
    paths = [
        f"{_fingerprint_path(fingerprint_root, v)}/__b={k}"
        for k, v in sorted(res.items())
    ]
    if not paths:
        raise FileNotFoundError(
            f"no fingerprint buckets at or below version {ver} under "
            f"{fingerprint_root}"
        )
    return spark.read.parquet(*paths)


def read_fingerprints(
    spark, corpus_root: str, fingerprint_root: str
) -> tuple[DataFrame, int]:
    """The fingerprint sidecar rows for the corpus's CURRENT version
    (the corpus _LATEST marker is the single commit point — the
    sidecar has no marker of its own). Handles both layouts via the
    sidecar's _BUCKETS marker. Returns (DataFrame, version)."""
    from chapterhousedb_spark.streaming.batcher import _read_latest_marker

    ver = _read_latest_marker(spark, corpus_root)
    buckets = _fp_buckets_of(spark, fingerprint_root)
    return _read_fingerprints_at(spark, fingerprint_root, ver, buckets), ver


def vacuum_fingerprints(
    spark,
    corpus_root: str,
    fingerprint_root: str,
    keep_last: int = 1,
) -> list[int]:
    """Retention sweep for a fingerprint sidecar. Plain layout:
    delegates to the versioned-base sweep under the corpus marker's
    protection. Bucketed layout: a version directory may be the NEWEST
    WRITER of a bucket that no later version touched, so the sweep
    keeps (a) every version referenced by the bucket resolution of ANY
    corpus version still on disk (not just the marker's — ADVICE r14:
    keeping only the latest resolution made a time-travel read at an
    older retained corpus version silently drop the buckets whose
    newest writer had been swept, because an absent bucket is
    indistinguishable from a never-populated one), (b) the newest
    keep_last versions, and (c) anything above the corpus marker (an
    orphan v+1 from a crash — the replay owns it). Invariant after the
    sweep: _read_fingerprints_at(v) returns complete data for every
    corpus version v still on disk, exactly matching the corpus's own
    time-travel reach. Returns the removed version numbers."""
    from chapterhousedb_spark.streaming.batcher import _read_latest_marker

    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    buckets = _fp_buckets_of(spark, fingerprint_root)
    if not buckets:
        from chapterhousedb_spark.streaming.batcher import vacuum_versions

        return vacuum_versions(
            spark, fingerprint_root, keep_last, marker_root=corpus_root
        )
    latest = _read_latest_marker(spark, corpus_root)
    versions = _fp_versions(spark, fingerprint_root)
    bmap = _fp_buckets_map(
        spark,
        fingerprint_root,
        [v for v in versions if v <= latest],
        live_versions=versions,
    )
    # one reverse sweep marks, for every corpus version still on disk,
    # the sidecar versions its resolution touches: sidecar version v is
    # referenced by corpus version c (v <= c <= latest) unless some
    # later sidecar version in (v, c] rewrote ALL of v's buckets —
    # equivalently, v stays referenced until the first corpus-retained
    # point where its every bucket has a newer writer
    corpus_versions = sorted(
        v
        for v in _fp_versions(spark, corpus_root)
        if v <= latest
    )
    referenced: set[int] = set()
    for c in corpus_versions:
        need = set(range(buckets))
        for v in sorted((x for x in versions if x <= c), reverse=True):
            present = bmap.get(v, frozenset()) & need
            if present:
                referenced.add(v)
            need -= present
            if not need:
                break
    keep = (
        referenced
        | set(sorted(versions)[-keep_last:])
        | {v for v in versions if v > latest}
    )
    jvm = spark._jvm
    removed = []
    for v in versions:
        if v in keep:
            continue
        jpath = jvm.org.apache.hadoop.fs.Path(
            _fingerprint_path(fingerprint_root, v)
        )
        fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
        fs.delete(jpath, True)
        removed.append(v)
    return removed


def fingerprint_kit(kind: str, id_col: str = "doc_id", **kwargs):
    """(fingerprint_fn, pairs_fn) for admit_batch's fingerprint-sidecar
    admission path (VERDICT r13 #1): `fingerprint_fn(df)` maps payload
    rows to compact fingerprint rows (always carrying `id_col`, so the
    sidecar upserts on the same key as the corpus), and
    `pairs_fn(batch_fp, corpus_fp)` is the bipartite near-dup gate
    over fingerprints alone — the corpus side is read from the
    persisted sidecar, never recomputed (for images that means the
    corpus is never re-DECODED per micro-batch).

    Kinds and their kwargs (defaults in parentheses):
    - 'minhash': text_col ('text'), num_hashes (64), bands (16),
      shingle_k (5), threshold (0.7). Fingerprint = (id, sig).
    - 'simhash': text_col ('text'), max_hamming (3), chunks (4).
      Fingerprint = (id, simhash).
    - 'image': method ('ahash'), max_hamming (3), chunks (4),
      payload_col ('payload'). Fingerprint = media_phash rows
      (ahash, dhash, ok) — 16 bytes/image.
    - 'audio': max_hamming (3), chunks (4), n_windows (64),
      payload_col ('payload'). Fingerprint = audio_phash rows.
    - 'video': min_containment (0.8), every_nth (1), max_df (None),
      payload_col ('payload'). Fingerprint = video_phash rows (one
      per sampled frame — the sidecar upsert replaces ALL of a
      replaced id's frame rows, multi-row ids are fine).

    The pairs_fn contract matches gate_fn's output: a DataFrame with
    (batch_id, corpus_id) columns (extra score columns are ignored by
    admit_batch)."""
    kinds = ("minhash", "simhash", "image", "audio", "video")
    if kind not in kinds:
        raise ValueError(
            f"fingerprint_kit: unknown kind {kind!r}; expected one of "
            f"{sorted(kinds)}"
        )
    # payload_col is a MEDIA-kind kwarg; popping it before dispatch
    # would let the text kinds silently swallow it (round-14 review),
    # breaking the strict-kwargs contract _reject_extra enforces for
    # every other irrelevant kwarg
    payload_col = (
        kwargs.pop("payload_col", "payload")
        if kind in ("image", "audio", "video")
        else "payload"
    )

    def _as_media(df):
        cols = [F.col(id_col).alias("media_id")]
        if payload_col != "payload":
            cols.append(F.col(payload_col).alias("payload"))
        else:
            cols.append(F.col("payload"))
        return df.select(*cols)

    def _keyed(fp):
        return fp.withColumnRenamed("media_id", id_col)

    if kind == "minhash":
        from chapterhousedb_spark.operators.dedup import (
            minhash_near_dup_pairs_cross_sigs,
            minhash_signature,
        )

        text_col = kwargs.pop("text_col", "text")
        num_hashes = kwargs.pop("num_hashes", 64)
        bands = kwargs.pop("bands", 16)
        shingle_k = kwargs.pop("shingle_k", 5)
        threshold = kwargs.pop("threshold", 0.7)
        _reject_extra(kind, kwargs)

        def fp_fn(df):
            return minhash_signature(
                df, text_col, id_col, num_hashes, shingle_k
            )

        def pairs_fn(batch_fp, corpus_fp):
            return minhash_near_dup_pairs_cross_sigs(
                batch_fp,
                corpus_fp,
                id_col=id_col,
                num_hashes=num_hashes,
                bands=bands,
                threshold=threshold,
            )

        return fp_fn, pairs_fn

    if kind == "simhash":
        from chapterhousedb_spark.operators.dedup import (
            hamming_near_dup_pairs_cross,
            simhash,
        )

        text_col = kwargs.pop("text_col", "text")
        max_hamming = kwargs.pop("max_hamming", 3)
        chunks = kwargs.pop("chunks", 4)
        _reject_extra(kind, kwargs)

        def fp_fn(df):
            return simhash(df, text_col, id_col)

        def pairs_fn(batch_fp, corpus_fp):
            return hamming_near_dup_pairs_cross(
                batch_fp, corpus_fp, "simhash", id_col, max_hamming, chunks
            )

        return fp_fn, pairs_fn

    if kind == "image":
        from chapterhousedb_spark.operators.multimodal import (
            media_near_dup_pairs_cross,
            media_phash,
        )

        method = kwargs.pop("method", "ahash")
        max_hamming = kwargs.pop("max_hamming", 3)
        chunks = kwargs.pop("chunks", 4)
        _reject_extra(kind, kwargs)

        def fp_fn(df):
            return _keyed(media_phash(_as_media(df)))

        def pairs_fn(batch_fp, corpus_fp):
            return media_near_dup_pairs_cross(
                None,
                None,
                method=method,
                max_hamming=max_hamming,
                chunks=chunks,
                batch_fingerprints=batch_fp.withColumnRenamed(
                    id_col, "media_id"
                ),
                corpus_fingerprints=corpus_fp.withColumnRenamed(
                    id_col, "media_id"
                ),
            )

        return fp_fn, pairs_fn

    if kind == "audio":
        from chapterhousedb_spark.operators.multimodal import (
            audio_near_dup_pairs_cross,
            audio_phash,
        )

        max_hamming = kwargs.pop("max_hamming", 3)
        chunks = kwargs.pop("chunks", 4)
        n_windows = kwargs.pop("n_windows", 64)
        _reject_extra(kind, kwargs)

        def fp_fn(df):
            return _keyed(audio_phash(_as_media(df), n_windows=n_windows))

        def pairs_fn(batch_fp, corpus_fp):
            return audio_near_dup_pairs_cross(
                None,
                None,
                max_hamming=max_hamming,
                chunks=chunks,
                batch_fingerprints=batch_fp.withColumnRenamed(
                    id_col, "media_id"
                ),
                corpus_fingerprints=corpus_fp.withColumnRenamed(
                    id_col, "media_id"
                ),
            )

        return fp_fn, pairs_fn

    # video
    from chapterhousedb_spark.operators.multimodal import (
        video_near_dup_pairs_cross,
        video_phash,
    )

    min_containment = kwargs.pop("min_containment", 0.8)
    every_nth = kwargs.pop("every_nth", 1)
    max_df = kwargs.pop("max_df", None)
    _reject_extra(kind, kwargs)

    def fp_fn(df):
        return _keyed(video_phash(_as_media(df), every_nth=every_nth))

    def pairs_fn(batch_fp, corpus_fp):
        return video_near_dup_pairs_cross(
            None,
            None,
            min_containment=min_containment,
            every_nth=every_nth,
            max_df=max_df,
            batch_fingerprints=batch_fp.withColumnRenamed(
                id_col, "media_id"
            ),
            corpus_fingerprints=corpus_fp.withColumnRenamed(
                id_col, "media_id"
            ),
        )

    return fp_fn, pairs_fn


def _reject_extra(kind: str, kwargs: dict) -> None:
    if kwargs:
        raise ValueError(
            f"fingerprint_kit({kind!r}): unexpected kwargs "
            f"{sorted(kwargs)}"
        )


def admit_batch(
    batch: DataFrame,
    corpus_root: str,
    labels_root: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    version_col: str = "version",
    threshold: float = 0.7,
    reject_near_dups: bool = True,
    num_hashes: int = 64,
    bands: int = 16,
    gate_fn=None,
    quality_fn=None,
    index_paths: dict[str, str] | None = None,
    fingerprint_root: str | None = None,
    fingerprint_fn=None,
    fp_gate_fn=None,
) -> dict:
    """Admit one batch into a versioned corpus. Steps:

    0. optional `quality_fn` gate (VERDICT r10 #8 — the FineWeb shape:
       quality -> dedup -> merge -> index): any callable
       (batch) -> surviving-rows DataFrame, applied BEFORE the dedup
       gate so low-quality docs never pay the LSH join. Use
       `fineweb_quality_gate()` for the stock Gopher+C4 predicate.
    1. cross MinHash gate: batch docs near-duplicating the CURRENT
       corpus version (one corpus scan; batch side broadcasts).
    2. `reject_near_dups=True`: gated docs are dropped before the
       merge (crawl-dedup mode). False: everything is admitted and
       the duplicate structure is recorded in the labels instead
       (provenance mode — requires labels_root).
    3. survivors merge_upsert into corpus v+1 (new directory; old
       version untouched).
    4. if labels_root: fold the admitted docs' cross+self pairs into
       the corpus cluster labels with components_update and write
       labels v+1 (rejected docs never enter the label space).
    5. if index_paths: append the admitted rows into each persisted
       ANN index against its FROZEN model state (VERDICT r9 #2 — the
       quantized families join the versioned-corpus story).
    6. flip the corpus _LATEST marker to v+1 (the commit point).

    `gate_fn` swaps the duplicate detector: any callable
    (batch, corpus) -> DataFrame with (batch_id, corpus_id) columns —
    e.g. a partial of simhash_near_dup_pairs_cross, or an
    embedding-side embedding_near_dup_pairs_cross for vector corpora.
    Default: the MinHash bipartite gate with this function's
    threshold/num_hashes/bands.

    `fingerprint_root` (VERDICT r13 #1) switches the gate to the
    FINGERPRINT SIDECAR path — the scale fix for the one O(corpus)
    per-batch cost the gate_fn path has: gate_fn receives the raw
    corpus rows, so every micro-batch re-fingerprints (for images:
    re-DECODES) the whole corpus. With a sidecar, the corpus side of
    the gate is a persisted fingerprint table (seeded by init_ingest,
    upserted here on every commit under the same version number as
    the corpus), so a micro-batch costs one batch-side fingerprint
    pass + a bipartite fingerprint join — O(batch + collisions),
    never O(corpus). `fingerprint_fn`/`fp_gate_fn` come as a pair
    (build one with `fingerprint_kit`): fingerprint_fn(df) -> compact
    fingerprint rows carrying id_col; fp_gate_fn(batch_fp, corpus_fp)
    -> (batch_id, corpus_id, ...) pairs. Omitting both uses the
    MinHash kit with this function's text_col/threshold/num_hashes/
    bands — identical admission decisions to the default gate_fn
    path. Mutually exclusive with gate_fn. Crash contract: the
    sidecar v+1 write is mode=overwrite and happens BEFORE the marker
    flip, so a replayed batch rewrites it idempotently and a reader
    never sees a corpus version without its fingerprints. When
    labels_root is maintained, self-pairs among admitted docs come
    from fp_gate_fn over the batch fingerprints (no re-fingerprint).

    `index_paths` maps index kind -> persisted index root: "ivf"
    (ivf_write_index layouts), "srp", "pq" (incl. by_residual), "sq8",
    "mrl" (prefix-column layouts — stateless, so its appends carry no
    freeze caveat at all).
    Each batch appends at O(batch) cost against the frozen
    centroids/planes/codebooks/bounds recorded in the index metadata;
    the admitted rows must carry the index's vec_col. Crash contract:
    index appends run BEFORE the marker flip, and parquet appends are
    not idempotent — a crash between an index append and the marker
    flip replays the batch and can leave the replayed rows TWICE in
    the affected index (the corpus itself stays exactly-once via the
    versioned merge). Duplicate index rows are benign for dedup-gated
    corpora (same id, same cell/codes; probes return the id twice and
    exact rerank re-scores it identically) and disappear at the next
    full index rebuild — callers needing strict-once index rows should
    rebuild indexes from the committed corpus version instead.
    UPSERT caveat (ADVICE r10): index appends only ADD rows, while
    merge_upsert REPLACES corpus rows for existing ids — a re-admitted
    doc whose embedding CHANGED (below the near-dup threshold, or past
    any custom gate_fn) leaves the old vector's codes in the index
    under the same id, and those stale codes can outrank the current
    vector in probes. That is NOT the benign same-codes case above:
    callers updating embeddings in place must rebuild the affected
    indexes from the committed corpus version to get correct scores
    for updated docs (exact rerank over the true vec_col still scores
    the CURRENT vector, so refine>0 probes self-heal the ranking; the
    coarse candidate stage does not).

    Returns {"version", "n_batch", "n_admitted", "n_rejected",
    "n_quality_rejected"} — n_rejected stays the TOTAL rejection count
    (quality + near-dup), so pre-round-11 callers read it unchanged.
    """
    from chapterhousedb_spark.operators.dedup import (
        minhash_near_dup_pairs_cross,
    )
    from chapterhousedb_spark.streaming.batcher import read_versioned_base

    if not reject_near_dups and labels_root is None:
        raise ValueError(
            "reject_near_dups=False records duplicates in the labels — "
            "pass labels_root"
        )
    if fingerprint_root is not None and gate_fn is not None:
        raise ValueError(
            "fingerprint_root and gate_fn are mutually exclusive: the "
            "sidecar path gates on persisted fingerprints (fp_gate_fn), "
            "gate_fn receives raw corpus rows"
        )
    if (fingerprint_fn is None) != (fp_gate_fn is None):
        raise ValueError(
            "fingerprint_fn and fp_gate_fn come as a pair (build one "
            "with fingerprint_kit); got only one of them"
        )
    if fingerprint_root is None and fingerprint_fn is not None:
        raise ValueError(
            "fingerprint_fn/fp_gate_fn need fingerprint_root — there "
            "is no sidecar to read or maintain without it"
        )
    if fingerprint_root is not None and fingerprint_fn is None:
        fingerprint_fn, fp_gate_fn = fingerprint_kit(
            "minhash",
            id_col=id_col,
            text_col=text_col,
            num_hashes=num_hashes,
            bands=bands,
            threshold=threshold,
        )
    _INDEX_KINDS = ("ivf", "srp", "pq", "sq8", "mrl")
    if index_paths:
        # validate BEFORE any writes: a typo'd kind must not leave a
        # half-admitted (pre-marker) version behind
        for kind in index_paths:
            if kind not in _INDEX_KINDS:
                raise ValueError(
                    f"unknown index kind {kind!r}; expected one of "
                    f"{sorted(_INDEX_KINDS)}"
                )
    from pyspark.storagelevel import StorageLevel

    spark = batch.sparkSession
    corpus, ver = read_versioned_base(spark, corpus_root)
    n_batch = batch.count()
    n_quality_rejected = 0
    quality_persisted = None
    raw_persisted = None
    admitted = None
    batch_fp = None
    corpus_fp = None
    fp_buckets = 0
    # everything from here runs under the unpersist guarantee: a
    # failure anywhere below — INCLUDING quality_fn itself raising
    # during DataFrame construction (an analysis error is exactly the
    # failure class this guards; ADVICE r12), a raising gate_fn, a
    # cross-join analysis error, an appender's dims guard — must not
    # leak cached state into the long-lived streaming session — one
    # RDD per retried micro-batch
    try:
        if quality_fn is not None:
            # persist the RAW batch first: every gate references it
            # more than once internally (fineweb: gopher + c4 + the
            # survivors join-back; dsir: per-order gram scans +
            # join-back), so without this cache the gate recomputes
            # the micro-batch's source lineage per reference (round-12
            # review fix); then persist the GATED batch: it feeds the
            # n_quality_rejected count, the cross dedup gate AND the
            # admitted anti-join below — without the cache the quality
            # joins replay ~3x per micro-batch (the same hazard
            # `admitted` is persisted for)
            raw_persisted = batch.persist(StorageLevel.MEMORY_AND_DISK)
            batch = quality_fn(raw_persisted).persist(
                StorageLevel.MEMORY_AND_DISK
            )
            quality_persisted = batch
            n_quality_rejected = n_batch - batch.count()
        if fingerprint_root is not None:
            # sidecar path: the corpus side of the gate is the
            # PERSISTED fingerprint table at the corpus's current
            # version — the corpus payloads are never re-read, let
            # alone re-fingerprinted/re-decoded, per micro-batch.
            # batch_fp persists because it feeds the gate AND the
            # sidecar upsert (and the label self-pairs when
            # maintained); one fingerprint pass per batch, total.
            # The root self-describes its layout (_BUCKETS marker).
            fp_buckets = _fp_buckets_of(spark, fingerprint_root)
            corpus_fp = _read_fingerprints_at(
                spark, fingerprint_root, ver, fp_buckets
            )
            batch_fp = fingerprint_fn(batch).persist(
                StorageLevel.MEMORY_AND_DISK
            )
            cross = fp_gate_fn(batch_fp, corpus_fp)
        elif gate_fn is not None:
            cross = gate_fn(batch, corpus)
        else:
            cross = minhash_near_dup_pairs_cross(
                batch,
                corpus,
                text_col=text_col,
                id_col=id_col,
                threshold=threshold,
                num_hashes=num_hashes,
                bands=bands,
            )
        if reject_near_dups:
            dup_ids = cross.select(
                F.col("batch_id").alias(id_col)
            ).distinct()
            admitted = batch.join(dup_ids, id_col, "left_anti")
            # pairs folded into labels: only among ADMITTED docs (the
            # rejected ones never exist in the corpus or label space)
            cross_pairs = None
        else:
            admitted = batch
            cross_pairs = cross.select(
                F.col("batch_id").alias("id_a"),
                F.col("corpus_id").alias("id_b"),
            )
        # `admitted` is the batch anti-joined against the near-dup
        # gate (a batch-x-corpus LSH join) and feeds the merge write,
        # the count, the label solve and every index append below —
        # persist it ONCE so the gate doesn't re-execute per consumer
        # (with five index_paths that would be ~8 replays of the most
        # expensive stage)
        admitted = admitted.persist(StorageLevel.MEMORY_AND_DISK)
        return _admit_batch_writes(
            spark,
            corpus,
            admitted,
            cross_pairs,
            corpus_root,
            labels_root,
            id_col,
            version_col,
            threshold,
            num_hashes,
            bands,
            index_paths,
            ver,
            n_batch,
            text_col,
            n_quality_rejected,
            fingerprint_root=fingerprint_root,
            batch_fp=batch_fp,
            corpus_fp=corpus_fp,
            fp_gate_fn=fp_gate_fn,
            fp_buckets=fp_buckets,
        )
    finally:
        if admitted is not None:
            admitted.unpersist()
        if quality_persisted is not None:
            quality_persisted.unpersist()
        if raw_persisted is not None:
            raw_persisted.unpersist()
        if batch_fp is not None:
            batch_fp.unpersist()


def _admit_batch_writes(
    spark,
    corpus,
    admitted,
    cross_pairs,
    corpus_root,
    labels_root,
    id_col,
    version_col,
    threshold,
    num_hashes,
    bands,
    index_paths,
    ver,
    n_batch,
    text_col,
    n_quality_rejected,
    fingerprint_root=None,
    batch_fp=None,
    corpus_fp=None,
    fp_gate_fn=None,
    fp_buckets=0,
) -> dict:
    """admit_batch's write half (merge -> labels -> fingerprint-sidecar
    upsert -> index appends -> marker flip), split out so the caller
    can guarantee the persisted `admitted`/`batch_fp` frames are
    released on every exit path."""
    from chapterhousedb_spark.operators.cluster import components_update
    from chapterhousedb_spark.operators.dedup import minhash_near_dup_pairs
    from chapterhousedb_spark.operators.merge import merge_upsert
    from chapterhousedb_spark.streaming.batcher import _write_latest_marker

    # materialize the persisted `admitted` frame ONCE (the count is
    # needed for the return value anyway) so the concurrent writers
    # below all read the cache instead of racing to compute it
    n_admitted = admitted.count()
    admitted_fp = None
    if fingerprint_root is not None:
        admitted_fp = batch_fp.join(
            admitted.select(id_col), id_col, "semi"
        )

    # The three per-commit artifacts (corpus v+1, labels v+1, sidecar
    # v+1) are mutually independent — each derives from the persisted
    # `admitted` + this version's inputs, and the marker flip below is
    # the only commit point. Run them as CONCURRENT driver-thread jobs
    # (guide §2.6): a micro-batch commit is dominated by per-write
    # job-scheduling + FS-commit constants, so overlapping the writes
    # cuts the per-batch wall without changing a byte of any artifact
    # or the crash contract (pre-marker dirs were already allowed to
    # exist in any subset; replays rewrite them idempotently).
    def _write_corpus():
        merged = merge_upsert(corpus, admitted, [id_col], version_col)
        merged.write.mode("overwrite").parquet(
            f"{corpus_root}/v{ver + 1:06d}"
        )

    def _write_labels():
        labels = spark.read.parquet(f"{labels_root}/v{ver}")
        if admitted_fp is not None:
            # self-pairs among admitted docs from their fingerprints —
            # the sidecar path never re-fingerprints; identical ids
            # (every doc trivially pairs with itself under any gate)
            # drop out, and components_update treats (a,b)/(b,a)
            # duplicates as the same edge
            selfp = (
                fp_gate_fn(admitted_fp, admitted_fp)
                .select(
                    F.col("batch_id").alias("id_a"),
                    F.col("corpus_id").alias("id_b"),
                )
                .filter(F.col("id_a") != F.col("id_b"))
            )
        else:
            selfp = minhash_near_dup_pairs(
                admitted,
                text_col=text_col,
                id_col=id_col,
                threshold=threshold,
                num_hashes=num_hashes,
                bands=bands,
                persist=False,
            ).select("id_a", "id_b")
        pairs = selfp if cross_pairs is None else cross_pairs.unionByName(selfp)
        new_labels = components_update(
            labels, pairs, new_nodes=admitted.select(id_col)
        )
        # overwrite, not errorifexists: a crash AFTER this write but
        # BEFORE the marker flip leaves an orphan v+1 dir; the
        # checkpoint replays the batch and must be able to rewrite it
        new_labels.write.mode("overwrite").parquet(f"{labels_root}/v{ver + 1}")

    def _write_sidecar():
        # sidecar upsert, mirroring merge_upsert's replace-on-key
        # semantics (a re-admitted id's fingerprints are REPLACED, not
        # appended — multi-row fingerprints like video frame hashes
        # anti-join away wholesale). mode=overwrite + written BEFORE
        # the marker flip: a replayed batch rewrites v+1 idempotently,
        # and no reader ever sees a corpus version without its
        # fingerprint table.
        if fp_buckets:
            # bucketed layout: v+1 holds ONLY the buckets admitted ids
            # touch — full contents for those buckets (survivor rows +
            # admitted rows), nothing for the rest, which the reader
            # resolves from their newest earlier writer. Commit cost is
            # O(touched buckets' rows), not O(all fingerprints).
            bcol = _fp_bucket_col(id_col, fp_buckets)
            admitted_fp_b = admitted_fp.withColumn("__b", bcol)
            touched = [
                r["__b"]
                for r in admitted_fp_b.select("__b").distinct().collect()
            ]
            survivors = (
                corpus_fp.withColumn("__b", bcol)
                .filter(F.col("__b").isin(touched))
                .join(admitted.select(id_col), id_col, "left_anti")
            )
            # delete any crashed-attempt v+1 dir BEFORE the write
            # (ADVICE r14): mode=overwrite under partitionOverwriteMode
            # =dynamic only replaces the partitions PRESENT in this
            # write, so __b dirs a previous crashed attempt touched but
            # this replay doesn't (a gate/param change in between)
            # would survive inside v+1 and become those buckets' newest
            # writer. The dir is pre-marker, hence unreferenced — a
            # plain delete is safe on every config.
            vpath = _fingerprint_path(fingerprint_root, ver + 1)
            jpath = spark._jvm.org.apache.hadoop.fs.Path(vpath)
            fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
            if fs.exists(jpath):
                fs.delete(jpath, True)
            survivors.unionByName(admitted_fp_b).write.partitionBy(
                "__b"
            ).mode("overwrite").parquet(vpath)
        else:
            new_fp = corpus_fp.join(
                admitted.select(id_col), id_col, "left_anti"
            ).unionByName(admitted_fp)
            new_fp.write.mode("overwrite").parquet(
                _fingerprint_path(fingerprint_root, ver + 1)
            )

    writers = [_write_corpus]
    if labels_root is not None:
        writers.append(_write_labels)
    if fingerprint_root is not None:
        writers.append(_write_sidecar)
    if len(writers) == 1:
        writers[0]()
    else:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=len(writers)) as pool:
            # .result() re-raises the first writer failure, so a failed
            # commit still aborts before the marker flip
            for fut in [pool.submit(w) for w in writers]:
                fut.result()
    if index_paths:
        from chapterhousedb_spark.operators.similarity import (
            ivf_append,
            mrl_append,
            pq_append,
            sq8_append,
            srp_append,
        )

        appenders = {
            "ivf": ivf_append,
            "srp": srp_append,
            "pq": pq_append,
            "sq8": sq8_append,
            "mrl": mrl_append,
        }
        for kind, ipath in index_paths.items():
            appenders[kind](admitted, ipath)
    # the marker flip is the commit point: readers only ever see a
    # version whose corpus AND labels directories are complete
    _write_latest_marker(spark, corpus_root, ver + 1)
    return {
        "version": ver + 1,
        "n_batch": n_batch,
        "n_admitted": n_admitted,
        "n_rejected": n_batch - n_admitted,
        "n_quality_rejected": n_quality_rejected,
    }


# auto-bucketing bounds (VERDICT r14 #3): the derived bucket count is
# clamped so a pathological seed/batch ratio can neither explode the
# per-commit touched-bucket listing (cap) nor silently pick the
# O(all-fingerprints) plain rewrite at scale (the floor is 1, where
# plain IS the right layout)
_FP_AUTO_BUCKET_CAP = 4096
# default batch-size assumption when no expected_batch_size hint is
# given: batches around 1/256 of the seed, so large corpora get B=256
_FP_AUTO_BATCH_FRACTION = 256
# no-hint derivation also floors bucket SIZE: below ~4096 rows a
# bucket is a tiny parquet file whose per-commit directory/listing
# overhead exceeds the rewrite it saves (measured r15: a ~1.7k-row
# sf0.1 seed auto-derived B≈278 six-row buckets and inflated
# streaming_ingest_corpus from ~6 s to ~75 s — hundreds of small-file
# dirs rewritten per micro-batch commit). Small sidecars take the
# plain layout; the bucketed win only exists when buckets are big
# enough that NOT rewriting them matters. An explicit
# expected_batch_size hint is applied literally (caller's judgment).
_FP_AUTO_MIN_ROWS_PER_BUCKET = 4096


def init_ingest(
    seed: DataFrame,
    corpus_root: str,
    labels_root: str | None = None,
    id_col: str = "doc_id",
    fingerprint_root: str | None = None,
    fingerprint_fn=None,
    fingerprint_buckets: int | None = None,
    expected_batch_size: int | None = None,
):
    """Seed the versioned corpus (and singleton labels when
    maintained) for an ingest loop. With fingerprint_root +
    fingerprint_fn (the sidecar contract — pair with admit_batch's
    fingerprint_root), the seed's fingerprints are computed ONCE here
    and written as sidecar v0; every subsequent admission reads and
    upserts the sidecar instead of re-fingerprinting corpus payloads.

    The sidecar defaults to the BUCKETED layout (VERDICT r14 #3 — the
    scale-safe layout must be what users get without reading
    SCALE.md): ids hash into B buckets (pmod(xxhash64(id), B)) stored
    as __b=k partition dirs, and each admission's v+1 writes ONLY the
    buckets its admitted ids touch — commit cost drops from O(all
    fingerprints) to O(touched buckets' rows), the remaining
    per-commit O(corpus) term at very large corpora. B is sized at
    ceil(seed_rows / expected_batch_size) clamped to [1, 4096]; pass
    `expected_batch_size` (rows per admitted micro-batch) to apply the
    SCALE.md sizing rule directly — without the hint, batches are
    assumed to run ~1/256 of the seed, giving B=256 for any large
    corpus, AND buckets are floored at ~4096 rows each (a small seed
    derives B=1/plain: sub-file-sized buckets cost more in per-commit
    directory overhead than the rewrite they save — measured r15). A
    batch touching >= B buckets degenerates to the full rewrite, so
    too-small B is the conservative direction. Pin
    `fingerprint_buckets=B` to override the derivation entirely;
    B == 1 (pinned or derived, e.g. an empty/tiny seed) selects the
    plain whole-table layout, which is identical at that size. The
    layout is recorded in a _BUCKETS marker, so admit_batch and
    read_fingerprints need no extra parameter; retention needs
    vacuum_fingerprints (a version dir may be the newest writer of a
    bucket no later version touched)."""
    from chapterhousedb_spark.streaming.batcher import (
        _write_marker,
        init_versioned_base,
    )

    if (fingerprint_root is None) != (fingerprint_fn is None):
        raise ValueError(
            "fingerprint_root and fingerprint_fn come together (build "
            "the fn with fingerprint_kit)"
        )
    if fingerprint_buckets is not None and fingerprint_root is None:
        raise ValueError("fingerprint_buckets needs fingerprint_root")
    if fingerprint_buckets is not None and fingerprint_buckets < 1:
        raise ValueError(
            f"fingerprint_buckets must be >= 1, got {fingerprint_buckets}"
        )
    if expected_batch_size is not None:
        if fingerprint_root is None:
            raise ValueError("expected_batch_size needs fingerprint_root")
        if fingerprint_buckets is not None:
            # both pinned B and a sizing hint: the hint would be
            # silently inert — reject, matching the strict-kwargs
            # contract everywhere else in this module
            raise ValueError(
                "expected_batch_size and fingerprint_buckets are "
                "mutually exclusive (the pinned bucket count wins)"
            )
        if expected_batch_size < 1:
            raise ValueError(
                f"expected_batch_size must be >= 1, got {expected_batch_size}"
            )
    v0_path = init_versioned_base(seed, corpus_root)
    # every later consumer (label seed, fingerprints, the bucket-count
    # row count) reads the JUST-WRITTEN v0 parquet instead of
    # re-evaluating the seed frame: a seed behind an expensive subtree
    # (codec mapInPandas in the media gates) would otherwise recompute
    # once per consumer — same rows either way, the write is the
    # materialization point (r15, guide §2.2/§4)
    seeded = seed.sparkSession.read.parquet(v0_path)
    # a re-seed of an EXISTING fingerprint_root in this process must
    # drop its cached listings — v0 is about to be rewritten, possibly
    # with a different bucket count, and reconciliation alone cannot
    # see an in-place rewrite (round-15 review finding)
    if fingerprint_root is not None:
        _FP_LISTING_CACHE.pop(fingerprint_root, None)
    if labels_root is not None:
        seeded.select(
            F.col(id_col).alias("id"), F.col(id_col).alias("component")
        ).write.mode("overwrite").parquet(f"{labels_root}/v0")
    if fingerprint_root is not None:
        fp = fingerprint_fn(seeded)
        if fingerprint_buckets is None:
            # auto-derive B (VERDICT r14 #3): seed_rows / batch_rows,
            # the SCALE.md sizing rule, from the hint or the default
            # batch-fraction assumption
            import math

            seed_n = seeded.count()
            batch_n = (
                expected_batch_size
                if expected_batch_size is not None
                else max(1, seed_n // _FP_AUTO_BATCH_FRACTION)
            )
            fingerprint_buckets = max(
                1, min(_FP_AUTO_BUCKET_CAP, math.ceil(seed_n / batch_n))
            )
            if expected_batch_size is None:
                # default heuristic only: keep buckets at least
                # _FP_AUTO_MIN_ROWS_PER_BUCKET rows so tiny sidecars
                # stay plain (see the bound's comment above)
                fingerprint_buckets = min(
                    fingerprint_buckets,
                    max(1, seed_n // _FP_AUTO_MIN_ROWS_PER_BUCKET),
                )
        if fingerprint_buckets > 1:
            fp.withColumn(
                "__b", _fp_bucket_col(id_col, fingerprint_buckets)
            ).write.partitionBy("__b").mode("overwrite").parquet(
                _fingerprint_path(fingerprint_root, 0)
            )
            _write_marker(
                seed.sparkSession,
                fingerprint_root,
                "_BUCKETS",
                fingerprint_buckets,
            )
        else:
            # B == 1: one bucket IS the whole table — plain layout
            fp.write.mode("overwrite").parquet(
                _fingerprint_path(fingerprint_root, 0)
            )


def fineweb_quality_gate(
    text_col: str = "text",
    id_col: str = "doc_id",
    gopher_kwargs: dict | None = None,
    c4_kwargs: dict | None = None,
):
    """The stock quality gate for admit_batch(quality_fn=...) — the
    FineWeb admission shape (VERDICT r10 #8): a batch doc survives iff
    it passes BOTH the Gopher document-shape heuristics
    (text.gopher_quality_stats keep) and the C4 line-level page rule
    (text.c4_line_filters keep). Returns a callable
    (batch) -> surviving rows, all original columns intact.

    Physical shape: both stat operators are single-scan JVM
    projections over the micro-batch; the two keep flags join back on
    the id (micro-batch-sized, broadcastable) and the survivors
    inner-join the original rows. No Python, no shuffle wider than the
    batch. The predicate arithmetic faces the hash gate through the
    gopher_quality / c4_clean rows and the composed admission through
    streaming_ingest_quality."""
    from chapterhousedb_spark.operators.text import (
        c4_line_filters,
        gopher_quality_stats,
    )

    gk = dict(gopher_kwargs or {})
    ck = dict(c4_kwargs or {})

    def gate(batch: DataFrame) -> DataFrame:
        g = gopher_quality_stats(batch, text_col, id_col, **gk).select(
            F.col(id_col), F.col("keep").alias("__gopher_keep")
        )
        c = c4_line_filters(batch, text_col, id_col, **ck).select(
            F.col(id_col), F.col("keep").alias("__c4_keep")
        )
        keep_ids = (
            g.join(c, id_col)
            .filter(F.col("__gopher_keep") & F.col("__c4_keep"))
            .select(id_col)
        )
        return batch.join(keep_ids, id_col)

    return gate


def ingest_stream(
    stream: DataFrame,
    corpus_root: str,
    checkpoint: str,
    labels_root: str | None = None,
    available_now: bool = True,
    **admit_kwargs,
):
    """Mount admit_batch on a streaming source via foreachBatch and
    start the query. Each micro-batch runs one full admission; the
    checkpoint + the versioned-marker commit point together give
    effectively-once admission (a replayed batch merges idempotently:
    merge_upsert on the same keys/versions reproduces the same v+1
    content). Returns the StreamingQuery."""

    def _apply(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        admit_batch(
            batch_df, corpus_root, labels_root=labels_root, **admit_kwargs
        )

    writer = stream.writeStream.foreachBatch(_apply).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
