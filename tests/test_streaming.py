"""Structured Streaming: incremental ingest (extract → sketch →
watermarked exact dedup → append sink, exactly-once over new files) and
the applyInPandasWithState per-domain stats operator."""

from pyspark.sql import functions as F


def test_ingest_incremental_and_dedup(spark, tmp_path):
    from ai_data_matching_spark.streaming.ingest import run_ingest
    from ai_data_matching_spark.synth import generate_pages

    in_dir, out_dir, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    pages = generate_pages(spark, 60, seed=3).select(
        "url", "warc_ts", "html", "text", "lang"
    ).cache()
    pages.write.parquet(in_dir)

    run_ingest(spark, in_dir, out_dir, ckpt, watermark="3650 days")
    out1 = spark.read.parquet(out_dir)
    n1 = out1.count()
    assert n1 > 0
    # stage 1+2 columns landed; heavy html dropped by the extract stage
    for col in ("norm_domain", "norm_text", "simhash", "minhash_sig"):
        assert col in out1.columns
    assert "html" not in out1.columns
    # in-stream exact dedup: unique (norm_domain, simhash) keys
    assert out1.select("norm_domain", "simhash").distinct().count() == n1

    # drop 2: the SAME pages again → all are exact dups, none lands
    pages.write.mode("append").parquet(in_dir)
    run_ingest(spark, in_dir, out_dir, ckpt, watermark="3650 days")
    assert spark.read.parquet(out_dir).count() == n1

    # drop 3: genuinely new pages → incremental growth, no reprocessing
    generate_pages(spark, 40, seed=99).select(
        "url", "warc_ts", "html", "text", "lang"
    ).withColumn("url", F.concat(F.lit("http://new-"), F.col("url"))).write.mode(
        "append"
    ).parquet(in_dir)
    run_ingest(spark, in_dir, out_dir, ckpt, watermark="3650 days")
    assert spark.read.parquet(out_dir).count() > n1


def test_domain_page_stats_stateful(spark, tmp_path):
    from ai_data_matching_spark.streaming.stateful import domain_page_stats

    in_dir = str(tmp_path / "pages")
    rows = [
        ("a.com", "2024-01-01 00:00:00"),
        ("a.com", "2024-01-02 00:00:00"),
        ("b.com", "2024-01-03 00:00:00"),
    ]
    df = spark.createDataFrame(rows, "norm_domain string, ts string").select(
        "norm_domain", F.col("ts").cast("timestamp").alias("warc_ts")
    )
    df.write.parquet(in_dir)
    df.write.mode("append").parquet(in_dir)  # second file group → more batches

    stream = (
        spark.readStream.schema("norm_domain string, warc_ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = (
        domain_page_stats(stream)
        .writeStream.format("memory")
        .queryName("dom_stats")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    final = (
        spark.table("dom_stats")
        .groupBy("norm_domain")
        .agg(F.max("n_pages").alias("n"))
        .collect()
    )
    got = {r["norm_domain"]: r["n"] for r in final}
    # both file groups processed through state: totals are cumulative
    assert got == {"a.com": 4, "b.com": 2}
