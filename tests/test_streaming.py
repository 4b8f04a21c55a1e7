"""Event-stream operators: batch/stream parity for the windowed agg."""

import pytest
from pyspark.sql import functions as F

from dataflow_flex_pyarrow_to_gds_spark.streaming.events import (
    event_type_pivot,
    hourly_stats,
    hourly_stats_stream,
    read_events,
    sessionize,
)


def test_read_events_nanos(spark, sf_dir):
    df = read_events(spark, sf_dir)
    assert df.schema["ts"].dataType.typeName() == "timestamp"
    assert df.count() == 1000


def test_hourly_stats_batch(spark, sf_dir):
    out = hourly_stats(read_events(spark, sf_dir))
    rows = out.collect()
    assert sum(r["n"] for r in rows) == 1000
    assert all(r["bucket"] % 3600 == 0 for r in rows)  # hour-aligned


def test_sessionize(spark):
    df = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", 7, "click", 1.0, ""),
            (2, "2024-01-01 00:10:00", 7, "view", 1.0, ""),   # same session
            (3, "2024-01-01 01:00:00", 7, "click", 1.0, ""),  # gap 50m → new
            (4, "2024-01-01 00:00:00", 8, "click", 1.0, ""),
        ],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r["user_id"]: r for r in sessionize(df, gap_minutes=30).collect()}
    assert out[7]["n_sessions"] == 2 and out[7]["n_events"] == 3
    assert out[8]["n_sessions"] == 1


def test_pivot_counts(spark, sf_dir):
    out = event_type_pivot(read_events(spark, sf_dir))
    rows = out.collect()
    assert len(rows) == 10
    total = sum(
        r["click"] + r["error"] + r["purchase"] + r["signup"] + r["view"]
        for r in rows
    )
    assert total == 1000


def test_streaming_matches_batch(spark, sf_dir, tmp_path):
    """The streaming hourly agg (watermark + window) must produce the same
    result as the batch expression once the source is exhausted."""
    # materialize events as micro-timestamp parquet for the stream source
    batch_df = read_events(spark, sf_dir)
    src = str(tmp_path / "events_stream")
    batch_df.write.parquet(src)

    stream = hourly_stats_stream(spark, src)
    q = (
        stream.writeStream.outputMode("complete")
        .format("memory")
        .queryName("hourly_out")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r["bucket"], r["event_type"]): (r["n"], r["total_value"])
            for r in spark.sql("SELECT * FROM hourly_out").collect()
        }
    finally:
        q.stop()
    want = {
        (r["bucket"], r["event_type"]): (r["n"], r["total_value"])
        for r in hourly_stats(batch_df).collect()
    }
    assert got == want


def test_stateful_running_totals(spark, sf_dir, tmp_path):
    """applyInPandasWithState totals must equal the batch groupBy after one
    pass over the source."""
    from dataflow_flex_pyarrow_to_gds_spark.streaming.events import (
        read_events,
        running_user_totals_stream,
    )

    batch_df = read_events(spark, sf_dir)
    src = str(tmp_path / "events_state")
    batch_df.write.parquet(src)

    stream = running_user_totals_stream(spark, src)
    q = (
        stream.writeStream.outputMode("update")
        .format("memory")
        .queryName("state_out")
        .start()
    )
    try:
        q.processAllAvailable()
        # "update" mode may emit a row per micro-batch; keep the last per user
        got_rows = spark.sql(
            "SELECT * FROM state_out"
        ).toPandas()
    finally:
        q.stop()
    got = {}
    for _, r in got_rows.iterrows():
        got[int(r["user_id"])] = (int(r["n_events"]), float(r["total_value"]))

    want = {
        int(r["user_id"]): (int(r["n"]), float(r["v"]))
        for r in batch_df.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("v"))
        .collect()
    }
    assert got == want


def test_stream_stream_join_matches_batch(spark, sf_dir, tmp_path):
    """Watermarked stream-stream interval join == the batch interval join
    once the source drains."""
    from dataflow_flex_pyarrow_to_gds_spark.streaming.events import (
        attribution_batch,
        purchase_attribution_stream,
        read_events,
    )

    batch_df = read_events(spark, sf_dir)
    src = str(tmp_path / "events_ss")
    batch_df.write.parquet(src)

    stream = purchase_attribution_stream(spark, src)
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("attr_out")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r["purchase_id"], r["click_id"])
            for r in spark.sql("SELECT * FROM attr_out").collect()
        }
    finally:
        q.stop()
    want = {
        (r["purchase_id"], r["click_id"])
        for r in attribution_batch(batch_df).collect()
    }
    assert got == want and len(want) > 0


def test_foreach_batch_exactly_once_shape(spark, sf_dir, tmp_path):
    """foreachBatch sink pattern: per-epoch idempotent parquet writes."""
    from dataflow_flex_pyarrow_to_gds_spark.streaming.events import (
        EVENTS_SCHEMA,
        read_events,
    )

    src = str(tmp_path / "events_fb")
    out = str(tmp_path / "fb_out")
    read_events(spark, sf_dir).write.parquet(src)

    def write_epoch(df, epoch_id):
        # mode overwrite + epoch-keyed dir = idempotent on retry
        df.write.mode("overwrite").parquet(f"{out}/epoch={epoch_id}")

    q = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .parquet(src)
        .writeStream.foreachBatch(write_epoch)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert spark.read.parquet(f"{out}/epoch=*").count() == 1000


def test_streaming_dedup_keys_match_batch(spark, sf_dir, tmp_path):
    """Watermarked streaming dropDuplicates: the surviving KEY SET equals
    the batch dedup's (which exact row survives per key is
    arrival-order-dependent in a stream, so parity is on keys)."""
    from dataflow_flex_pyarrow_to_gds_spark.streaming.events import (
        dedup_events_batch,
        dedup_events_stream,
        read_events,
    )

    batch_df = read_events(spark, sf_dir)
    src = str(tmp_path / "events_dedup")
    batch_df.write.parquet(src)

    stream = dedup_events_stream(spark, src)
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r["user_id"], r["event_type"])
            for r in spark.sql("SELECT * FROM dedup_out").collect()
        }
    finally:
        q.stop()
    want = {
        (r["user_id"], r["event_type"])
        for r in dedup_events_batch(batch_df).collect()
    }
    assert got == want
    # one row per key in the stream output too
    n = spark.sql("SELECT count(*) c FROM dedup_out").first()["c"]
    assert n == len(want)


def test_streaming_dedup_within_watermark_variant(spark, sf_dir, tmp_path):
    """dropDuplicatesWithinWatermark (bounded per-key state) produces one
    row per key on a single drained pass as well."""
    from dataflow_flex_pyarrow_to_gds_spark.streaming.events import (
        dedup_events_stream,
        read_events,
    )

    batch_df = read_events(spark, sf_dir)
    src = str(tmp_path / "events_dedup_ww")
    batch_df.write.parquet(src)

    stream = dedup_events_stream(spark, src, within_watermark=True)
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_ww_out")
        .start()
    )
    try:
        q.processAllAvailable()
        keys = {
            (r["user_id"], r["event_type"])
            for r in spark.sql("SELECT * FROM dedup_ww_out").collect()
        }
        n = spark.sql("SELECT count(*) c FROM dedup_ww_out").first()["c"]
    finally:
        q.stop()
    assert n == len(keys)  # exactly one survivor per key


def test_stream_static_enrichment_matches_batch(spark, sf_dir, tmp_path):
    """Stream-static broadcast join parity: draining the stream yields
    exactly the batch join (stateless — every micro-batch sees the full
    static side)."""
    from dataflow_flex_pyarrow_to_gds_spark.streaming.events import (
        enrich_events_stream,
        read_events,
    )

    dim = spark.createDataFrame(
        [("click", 0.1), ("view", 0.2), ("purchase", 5.0),
         ("signup", 2.0), ("error", 0.0)],
        "event_type string, weight double",
    )
    src = str(tmp_path / "events_stream")
    read_events(spark, sf_dir).write.parquet(src)
    q = (
        enrich_events_stream(spark, src, dim)
        .writeStream.format("memory")
        .queryName("enriched")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT event_id, weight FROM enriched ORDER BY event_id"
    ).collect()
    batch = (
        read_events(spark, sf_dir)
        .join(dim, "event_type")
        .select("event_id", "weight")
        .orderBy("event_id")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in batch]


def test_streaming_document_curation_matches_batch(spark, sf_dir, tmp_path):
    """Arrival-time curation (quality gate + PII scan/redact + token
    stats) is stateless, so the streaming run over a file source must
    equal the batch run row-for-row — no watermark, no state store."""
    from dataflow_flex_pyarrow_to_gds_spark.operators.pii import (
        seed_synthetic_pii,
    )
    from dataflow_flex_pyarrow_to_gds_spark.streaming.documents import (
        curate_documents_batch,
        curate_documents_stream,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # seed PII so the scan/redact columns are non-vacuous in the parity
    seeded = seed_synthetic_pii(docs, "doc_id", "text", out_col="text_pii")
    staged = seeded.select(
        "doc_id",
        F.col("text_pii").alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    src = str(tmp_path / "docs_stream")
    staged.write.parquet(src)

    stream = curate_documents_stream(spark, src)
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("doc_curation_out")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            r["doc_id"]: (
                r["n_tokens"], r["n_pii"], r["keep"], r["text_redacted"]
            )
            for r in spark.sql("SELECT * FROM doc_curation_out").collect()
        }
    finally:
        q.stop()
    want = {
        r["doc_id"]: (
            r["n_tokens"], r["n_pii"], r["keep"], r["text_redacted"]
        )
        for r in curate_documents_batch(spark.read.parquet(src)).collect()
    }
    assert got == want
    assert any(v[1] > 0 for v in want.values())  # seeded PII was seen
    assert all("[EMAIL]" in v[3] for k, v in want.items() if k % 3 == 0)


def test_streaming_admission_matches_batch_twin(spark, sf_dir, tmp_path):
    """admit_documents_stream (foreachBatch: curation + persisted-index
    near-dup admission, per-epoch idempotent parquet) equals the batch
    twin row-for-row once the availableNow source drains — cross-doc
    state lives in the index, so the stream itself is stateless."""
    from dataflow_flex_pyarrow_to_gds_spark.operators.dedup import (
        build_minhash_index,
    )
    from dataflow_flex_pyarrow_to_gds_spark.streaming.documents import (
        admit_documents_batch,
        admit_documents_stream,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = docs.filter(F.col("doc_id") % 7 != 0)
    batch = docs.filter(F.col("doc_id") % 7 == 0)

    index = str(tmp_path / "idx")
    build_minhash_index(corpus, "doc_id", "text", index)

    src = str(tmp_path / "arrivals")
    # two files → at least one micro-batch each under availableNow
    batch.repartition(2).write.parquet(src)
    out = str(tmp_path / "admitted")

    q = admit_documents_stream(
        spark, src, index, out,
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    key = lambda r: (  # noqa: E731
        r["doc_id"], r["n_tokens"], r["n_pii"], r["n_corpus_dups"],
        r["admit"], r["text_redacted"],
    )
    got = sorted(
        map(key, spark.read.parquet(f"{out}/epoch=*").collect())
    )
    want = sorted(
        map(key, admit_documents_batch(spark, batch, index).collect())
    )
    assert got == want and len(got) == batch.count()
    # the admission is non-vacuous: some doc is rejected for duplication
    assert any(r[3] > 0 for r in got)


def test_streaming_admission_self_maintaining_index(spark, tmp_path):
    """update_index=True folds each epoch's admissions back into the
    persisted index, so a near-duplicate arriving in a LATER epoch is
    rejected against an EARLIER epoch's admission — not just the base
    corpus. Control: without index updates both copies are admitted.
    The two copies land in separate files (maxFilesPerTrigger=1 →
    separate epochs); whichever epoch runs first admits, the other
    must reject, so the assertion is order-independent."""
    import shutil

    from dataflow_flex_pyarrow_to_gds_spark.operators.dedup import (
        build_minhash_index,
    )
    from dataflow_flex_pyarrow_to_gds_spark.streaming.documents import (
        admit_documents_stream,
    )

    # texts must PASS the Gopher gate (>= 30 words, stopword hits, sane
    # mean word length) so the admit decision is purely the dedup's
    # ...while sharing only stopwords ACROSS seeds (jaccard ≈ 0.4, well
    # under the 0.8 dup threshold — only identical texts collide)
    def wordy(seed: str) -> str:
        ws = " ".join(f"{seed}{i}" for i in range(12))
        return (
            f"the {seed} report says that {ws} while some of the new "
            f"{seed} items were kept in the big {seed} box for later use"
        )

    corpus = spark.createDataFrame(
        [(1, wordy("base"), "en", "s", 40)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    novel = wordy("novel")
    f1 = spark.createDataFrame(
        [(10, novel, "en", "s", 60)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    f2 = spark.createDataFrame(
        [(20, novel, "en", "s", 60),
         (21, wordy("second"), "en", "s", 40)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )

    def run(update_index):
        index = str(tmp_path / f"idx_{update_index}")
        build_minhash_index(corpus, "doc_id", "text", index)
        src = str(tmp_path / f"src_{update_index}")
        f1.coalesce(1).write.mode("overwrite").parquet(f"{src}")
        f2.coalesce(1).write.mode("append").parquet(f"{src}")
        out = str(tmp_path / f"out_{update_index}")
        q = admit_documents_stream(
            spark, src, index, out,
            checkpoint=str(tmp_path / f"ckpt_{update_index}"),
            update_index=update_index,
            max_files_per_trigger=1,
        )
        q.awaitTermination(180)
        return {
            r["doc_id"]: (r["admit"], r["n_corpus_dups"])
            for r in spark.read.parquet(f"{out}/epoch=*").collect()
        }

    with_update = run(True)
    # exactly ONE of the two identical docs admitted, the other rejected
    admits = [with_update[10][0], with_update[20][0]]
    assert sorted(admits) == [False, True], with_update
    assert with_update[21][0]  # the unrelated arrival always admitted
    without = run(False)
    assert without[10][0] and without[20][0]  # control: both slip through


def test_streaming_admission_epoch_replay_stable(spark, tmp_path):
    """r10 (ADVICE): a micro-batch re-run after its side effects landed
    but BEFORE the streaming checkpoint commit (the crash-recovery
    scenario) must not change any admission decision. Simulated for
    real: run the stream to completion with update_index=True, delete
    the LAST checkpoint commit file (offsets stay), restart — Structured
    Streaming replays that epoch with identical batch content. Under
    the pre-r10 code the replayed epoch recomputed admission against an
    index already containing its own admitted fingerprints, flipping
    them to admit=false (jaccard 1.0 against themselves); now the epoch
    body sees its landed output and skips recomputation."""
    import os

    from dataflow_flex_pyarrow_to_gds_spark.operators.dedup import (
        build_minhash_index,
    )
    from dataflow_flex_pyarrow_to_gds_spark.streaming.documents import (
        admit_documents_stream,
    )

    def wordy(seed: str) -> str:
        ws = " ".join(f"{seed}{i}" for i in range(12))
        return (
            f"the {seed} report says that {ws} while some of the new "
            f"{seed} items were kept in the big {seed} box for later use"
        )

    corpus = spark.createDataFrame(
        [(1, wordy("base"), "en", "s", 40)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    f1 = spark.createDataFrame(
        [(10, wordy("novel"), "en", "s", 60)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    f2 = spark.createDataFrame(
        [(20, wordy("novel"), "en", "s", 60),   # dup of 10 → rejected
         (21, wordy("second"), "en", "s", 40)],  # admitted + appended
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    index = str(tmp_path / "idx")
    build_minhash_index(corpus, "doc_id", "text", index)
    src = str(tmp_path / "src")
    f1.coalesce(1).write.mode("overwrite").parquet(src)
    f2.coalesce(1).write.mode("append").parquet(src)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        import time

        q = admit_documents_stream(
            spark, src, index, out,
            checkpoint=ckpt, update_index=True, max_files_per_trigger=1,
        )
        q.awaitTermination(300)
        q.stop()  # fully release the checkpoint before the next run
        for _ in range(100):
            if not q.isActive:
                break
            time.sleep(0.1)
        return {
            r["doc_id"]: (r["admit"], r["n_corpus_dups"])
            for r in spark.read.parquet(f"{out}/epoch=*").collect()
        }

    first = drain()
    assert first[10] == (True, 0) and first[21][0] and not first[20][0], first

    # simulate crash-before-commit on the LAST epoch: side effects
    # (epoch output + index append) landed, commit did not
    commits = sorted(
        (s for s in os.listdir(f"{ckpt}/commits") if s.isdigit()),
        key=int,
    )
    os.remove(f"{ckpt}/commits/{commits[-1]}")
    crc = f"{ckpt}/commits/.{commits[-1]}.crc"  # LocalFS checksum sidecar
    if os.path.exists(crc):
        os.remove(crc)

    replayed = drain()
    assert replayed == first, (first, replayed)


def test_streaming_sketch_store_merges_exactly(spark, sf_dir, tmp_path):
    """Mergeable-sketch maintenance (r11): per-day HLL partials appended
    per micro-batch, merged on read. HLL union is register-wise max, so
    the merged estimate must equal the single-pass batch sketch EXACTLY
    (same lgK), and both stay within the 10% gate of exact distincts —
    across a source deliberately split into multiple files so the
    stream sees several micro-batches."""
    from pyspark.sql import functions as F

    from dataflow_flex_pyarrow_to_gds_spark.streaming.events import (
        read_events,
        sketch_store_rollup,
        sketch_store_stream,
    )

    ev = read_events(spark, sf_dir).select("ts", "user_id")
    src = str(tmp_path / "ev_src")
    ev.repartition(4).write.parquet(src)  # several files → several batches

    store = str(tmp_path / "store")
    q = sketch_store_stream(
        spark, src, store, str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)

    merged = {
        r["day"]: r["est_users"]
        for r in sketch_store_rollup(spark, store).collect()
    }

    daily = ev.select(F.to_date("ts").alias("day"), "user_id")
    single = {
        str(r["day"]): r["est"]
        for r in daily.groupBy("day")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est"))
        .collect()
    }
    exact = {
        str(r["day"]): r["n"]
        for r in daily.groupBy("day")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    exact["ALL"] = daily.select("user_id").distinct().count()
    single["ALL"] = daily.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("e")
    ).first()["e"]

    assert set(merged) == set(single) == set(exact)
    for day in merged:
        assert merged[day] == single[day], day  # register-exact merge
        assert abs(merged[day] - exact[day]) / exact[day] <= 0.10, day


def test_streaming_cms_store_multi_epoch_exact(spark, sf_dir, tmp_path):
    """CMS maintenance (r12, VERDICT r11 #5): per-day count-min partials
    folded per micro-batch across TWO drain epochs (second epoch sees
    only the newly-landed files via the checkpoint), merged on read —
    and CMS merge is counter-wise integer sum, so merged must equal the
    single-pass sketch over the full history BIT-EXACTLY (assert ==,
    not a tolerance gate)."""
    from pyspark.sql import functions as F

    from dataflow_flex_pyarrow_to_gds_spark.operators.profile import (
        cms_sketch,
    )
    from dataflow_flex_pyarrow_to_gds_spark.streaming.events import (
        cms_store_rollup,
        cms_store_stream,
        read_events,
    )

    ev = read_events(spark, sf_dir).select("ts", "user_id")
    first = ev.filter(F.col("user_id") % 2 == 0)
    second = ev.filter(F.col("user_id") % 2 == 1)
    src, store, ckpt = (
        str(tmp_path / "src"),
        str(tmp_path / "store"),
        str(tmp_path / "ckpt"),
    )

    first.repartition(3).write.parquet(src)  # epoch 1
    q = cms_store_stream(spark, src, store, ckpt)
    q.awaitTermination(120)
    second.repartition(2).write.mode("append").parquet(src)  # epoch 2
    q = cms_store_stream(spark, src, store, ckpt)
    q.awaitTermination(120)

    merged = {
        (r["cms_row"], r["cms_bucket"]): r["cnt"]
        for r in cms_store_rollup(spark, store).collect()
    }
    daily = ev.select(F.to_date("ts").alias("day"), "user_id")
    single = {
        (r["cms_row"], r["cms_bucket"]): r["cnt"]
        for r in cms_sketch(daily, "user_id", width=64).collect()
    }
    assert merged == single  # bit-exact, every counter
    # epoch 2 actually ran incrementally: the store holds >1 batch dir
    import os

    batches = [d for d in os.listdir(store) if d.startswith("batch_id=")]
    assert len(batches) >= 2, batches


def test_streaming_bloom_store_multi_epoch_exact_and_idempotent(
    spark, sf_dir, tmp_path
):
    """Bloom maintenance (r12): per-day filter partials folded per
    micro-batch across TWO drain epochs, merged on read by bitwise OR —
    merged must equal the single-pass filter over the full history
    BIT-EXACTLY, and because OR is idempotent, re-merging a duplicated
    partial (an at-least-once replay) changes NOTHING (the tolerance
    CMS sums do not have)."""
    from pyspark.sql import functions as F

    from dataflow_flex_pyarrow_to_gds_spark.operators.profile import (
        bloom_sketch,
    )
    from dataflow_flex_pyarrow_to_gds_spark.streaming.events import (
        bloom_store_rollup,
        bloom_store_stream,
        read_events,
    )

    ev = read_events(spark, sf_dir).select("ts", "user_id")
    first = ev.filter(F.col("user_id") % 2 == 0)
    second = ev.filter(F.col("user_id") % 2 == 1)
    src, store, ckpt = (
        str(tmp_path / "src"),
        str(tmp_path / "store"),
        str(tmp_path / "ckpt"),
    )

    first.repartition(3).write.parquet(src)  # epoch 1
    q = bloom_store_stream(spark, src, store, ckpt)
    q.awaitTermination(120)
    second.repartition(2).write.mode("append").parquet(src)  # epoch 2
    q = bloom_store_stream(spark, src, store, ckpt)
    q.awaitTermination(120)

    merged = {
        r["bloom_word"]: r["bits"]
        for r in bloom_store_rollup(spark, store).collect()
    }
    daily = ev.select(F.to_date("ts").alias("day"), "user_id")
    single = {
        r["bloom_word"]: r["bits"]
        for r in bloom_sketch(daily, "user_id", m_bits=4096).collect()
    }
    assert merged == single  # bit-exact, every word
    # idempotence under replay: double-read the store and re-OR
    store_df = spark.read.parquet(store)
    replayed = {
        r["bloom_word"]: r["bits"]
        for r in store_df.unionByName(store_df)
        .groupBy("bloom_word")
        .agg(F.bit_or("bits").alias("bits"))
        .collect()
    }
    assert replayed == single
    import os

    batches = [d for d in os.listdir(store) if d.startswith("batch_id=")]
    assert len(batches) >= 2, batches


def test_streaming_kmv_store_multi_epoch_exact_and_idempotent(
    spark, sf_dir, tmp_path
):
    """KMV maintenance (r12): per-day bottom-k partials folded per
    micro-batch across TWO drain epochs, merged on read by
    distinct + re-bottom-k — min commutes with min, so merged must
    equal the single-pass sketch over the full history BIT-EXACTLY,
    and like Bloom's OR (unlike CMS sums) re-merging a duplicated
    partial (an at-least-once replay) changes NOTHING."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from dataflow_flex_pyarrow_to_gds_spark.operators.profile import (
        kmv_sketch,
    )
    from dataflow_flex_pyarrow_to_gds_spark.streaming.events import (
        kmv_store_rollup,
        kmv_store_stream,
        read_events,
    )

    ev = read_events(spark, sf_dir).select("ts", "user_id")
    first = ev.filter(F.col("user_id") % 2 == 0)
    second = ev.filter(F.col("user_id") % 2 == 1)
    src, store, ckpt = (
        str(tmp_path / "src"),
        str(tmp_path / "store"),
        str(tmp_path / "ckpt"),
    )

    first.repartition(3).write.parquet(src)  # epoch 1
    q = kmv_store_stream(spark, src, store, ckpt)
    q.awaitTermination(120)
    second.repartition(2).write.mode("append").parquet(src)  # epoch 2
    q = kmv_store_stream(spark, src, store, ckpt)
    q.awaitTermination(120)

    merged = {
        (r["kmv_pos"], r["kmv_hash"])
        for r in kmv_store_rollup(spark, store).collect()
    }
    daily = ev.select(F.to_date("ts").alias("day"), "user_id")
    single = {
        (r["kmv_pos"], r["kmv_hash"])
        for r in kmv_sketch(daily, "user_id", k=32).collect()
    }
    assert merged == single  # bit-exact, every rank
    # idempotence under replay: double-read the store and re-merge
    store_df = spark.read.parquet(store)
    w = Window.orderBy(F.asc("kmv_hash"))
    replayed = {
        (r["kmv_pos"], r["kmv_hash"])
        for r in store_df.unionByName(store_df)
        .select("kmv_hash")
        .distinct()
        .select("kmv_hash", F.row_number().over(w).alias("kmv_pos"))
        .filter(F.col("kmv_pos") <= 32)
        .select("kmv_pos", "kmv_hash")
        .collect()
    }
    assert replayed == single
    import os

    batches = [d for d in os.listdir(store) if d.startswith("batch_id=")]
    assert len(batches) >= 2, batches


def test_resample_locf_hand_computed(spark):
    """LOCF regularization by hand: gaps fill with the carried value,
    multi-event days pick the (ts, order)-max representative, each
    key's grid spans exactly [first, last] day, null values are not
    observations, and is_observed marks real days."""
    from pyspark.sql import functions as F

    from dataflow_flex_pyarrow_to_gds_spark.streaming.events import (
        resample_locf,
    )

    rows = [
        (1, "2024-01-01 08:00:00", 10.0, 1),
        (1, "2024-01-01 09:00:00", 11.0, 2),   # same day, later ts wins
        (1, "2024-01-04 12:00:00", 40.0, 3),   # 2-day gap before this
        (2, "2024-01-02 00:00:00", 7.0, 4),
        (2, "2024-01-02 00:00:00", 8.0, 5),    # ts tie: order_col wins
        (2, "2024-01-03 00:00:00", None, 6),   # null: not an observation
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts string, value double, event_id long"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {
        (r["user_id"], str(r["day"])[:10]): (
            r["value_locf"], r["is_observed"]
        )
        for r in resample_locf(
            df, "user_id", "ts", "value", "event_id"
        ).collect()
    }
    assert got == {
        (1, "2024-01-01"): (11.0, True),
        (1, "2024-01-02"): (11.0, False),
        (1, "2024-01-03"): (11.0, False),
        (1, "2024-01-04"): (40.0, True),
        (2, "2024-01-02"): (8.0, True),
    }


def test_streaming_interp_store_drain_parity(spark, tmp_path):
    """r14 (VERDICT r13 #7): the interpolation store drained across TWO
    epochs — the second delivering LATE events that shift day
    representatives and add a later right neighbor — must merge-on-read
    to BIT-exactly the single-pass batch resample_interp over the full
    history, interior gaps re-interpolated included."""
    import datetime as dt

    from pyspark.sql import functions as F

    from dataflow_flex_pyarrow_to_gds_spark.operators.resample import (
        resample_interp,
    )
    from dataflow_flex_pyarrow_to_gds_spark.streaming.events import (
        EVENTS_SCHEMA,
        interp_store_rollup,
        interp_store_stream,
    )

    def ev(eid, day, hour, user, value):
        return (
            eid,
            dt.datetime(2024, 3, day, hour, 0, 0),
            user,
            "view",
            float(value),
            "{}",
        )

    # epoch 1: user 7 observes days 1 and 5 (gap 2-4), user 8 days 2-3
    first = [
        ev(1, 1, 10, 7, 10.0),
        ev(2, 5, 10, 7, -6.5),  # negative slope: sign-split div path
        ev(3, 2, 9, 8, 1.25),
        ev(4, 3, 9, 8, 2.5),
    ]
    # epoch 2, late data: a same-day LATER event replaces user 7's day-1
    # representative, and a new day-9 obs extends the grid so days 6-8
    # must interpolate toward the NEW right neighbor
    second = [
        ev(5, 1, 23, 7, 4.0),
        ev(6, 9, 8, 7, 20.0),
    ]
    src, store, ckpt = (
        str(tmp_path / "src"),
        str(tmp_path / "store"),
        str(tmp_path / "ckpt"),
    )
    spark.createDataFrame(first, EVENTS_SCHEMA).repartition(2).write.parquet(
        src
    )
    q = interp_store_stream(spark, src, store, ckpt)
    q.awaitTermination(120)
    spark.createDataFrame(second, EVENTS_SCHEMA).repartition(1).write.mode(
        "append"
    ).parquet(src)
    q = interp_store_stream(spark, src, store, ckpt)
    q.awaitTermination(120)

    merged = {
        (r["user_id"], r["day"], r["value_interp_fp"], r["is_observed"])
        for r in interp_store_rollup(spark, store).collect()
    }
    full = spark.createDataFrame(first + second, EVENTS_SCHEMA)
    single = {
        (r["user_id"], r["day"], r["value_interp_fp"], r["is_observed"])
        for r in resample_interp(
            full, "user_id", "ts", "value", "event_id"
        ).collect()
    }
    assert merged == single
    # the late same-day event won: day 1 carries the 23:00 value
    d1 = [v for u, d, v, o in merged if u == 7 and d.day == 1]
    assert d1 == [4_000_000]
    # interior gap re-interpolated toward the new right neighbor:
    # fp(7) = -6_500_000 + (|20e6 - (-6.5e6)|·(7-5)) div (9-5)
    assert (7, dt.datetime(2024, 3, 7), 6_750_000, False) in merged
    import os

    assert (
        len([d for d in os.listdir(store) if d.startswith("batch_id=")])
        >= 2
    )
