"""N-Triples source (S1 parity) and Structured-Streaming extraction parity."""

from __future__ import annotations

from qse_spark.sources.ntriples import read_ntriples
from qse_spark.stats import shape_stats
from qse_spark.streaming.extract import streaming_extract

NT = """\
<http://ex/alice> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://ex/Person> .
<http://ex/alice> <http://ex/name> "Alice" .
<http://ex/alice> <http://ex/age> "34"^^<http://www.w3.org/2001/XMLSchema#integer> .
<http://ex/alice> <http://ex/greet> "bonjour"@fr .
<http://ex/alice> <http://ex/knows> _:b0 .
_:b0 <http://ex/name> "Bob" .
# a comment line

<http://ex/alice> <http://ex/born> "2001-02-03"^^<http://www.w3.org/2001/XMLSchema#date> .
"""


def test_ntriples_parse(spark, tmp_path):
    p = tmp_path / "x.nt"
    p.write_text(NT)
    rows = {(r["subject"], r["predicate"]): (r["object"], r["obj_kind"])
            for r in read_ntriples(spark, str(p)).collect()}
    assert rows[("http://ex/alice",
                 "http://www.w3.org/1999/02/22-rdf-syntax-ns#type")] == \
        ("http://ex/Person", "iri")
    assert rows[("http://ex/alice", "http://ex/name")] == ("Alice", "string")
    assert rows[("http://ex/alice", "http://ex/age")] == ("34", "integer")
    assert rows[("http://ex/alice", "http://ex/greet")] == \
        ("bonjour@fr", "langString")
    assert rows[("http://ex/alice", "http://ex/knows")] == ("_:b0", "iri")
    assert rows[("_:b0", "http://ex/name")] == ("Bob", "string")
    assert rows[("http://ex/alice", "http://ex/born")] == \
        ("2001-02-03", "date")
    assert len(rows) == 7


def test_ntriples_feed_kernel(spark, tmp_path):
    p = tmp_path / "k.nt"
    p.write_text(NT)
    st = shape_stats(read_ntriples(spark, str(p)),
                     type_predicate="http://www.w3.org/1999/02/22-rdf-syntax-ns#type")
    rows = {(r["class"], r["property"], r["obj_type"]): r["support"]
            for r in st.collect()}
    assert rows[("http://ex/Person", "http://ex/age", "xsd:integer")] == 1


def test_streaming_extraction_parity(spark, fixture_dir, tmp_path):
    """Streaming over the same parquet produces exactly the batch triples."""
    import shutil
    from qse_spark.operators.extraction import extract_triples
    batch = sorted(map(tuple, extract_triples(
        spark.read.parquet(f"{fixture_dir}/transcripts.parquet")).collect()))
    stream_dir = tmp_path / "stream_in"           # file source needs a dir
    stream_dir.mkdir()
    shutil.copy(f"{fixture_dir}/transcripts.parquet",
                stream_dir / "part-000.parquet")
    stream = streaming_extract(spark, str(stream_dir))
    q = (stream.writeStream.format("memory").queryName("stream_triples")
         .outputMode("append").start())
    try:
        q.processAllAvailable()
        got = sorted(map(tuple,
                         spark.sql("SELECT * FROM stream_triples").collect()))
    finally:
        q.stop()
    assert got == batch


def test_ntriples_roundtrip(spark, tmp_path):
    from pyspark.sql import functions as F

    from qse_spark.sources.ntriples import write_ntriples
    rows = [
        ("alice", "rdf:type", "Person", "iri"),
        ("alice", "age", "34", "integer"),
        ("alice", "joinedOn", "2001-02-03", "date"),
        ("alice", "greeting", "hola@es", "langString"),
        ("acme", "motto", "just works", "string"),
        ("alice", "worksAt", "acme", "iri"),
    ]
    df = spark.createDataFrame(rows, ["subject", "predicate", "object",
                                      "obj_kind"])
    out = str(tmp_path / "rt_nt")
    write_ntriples(df, out)
    back = read_ntriples(spark, out)
    strip = lambda c: F.regexp_replace(c, "^http://ex.org/", "")  # noqa: E731
    got = {tuple(r) for r in back.select(
        strip("subject"), strip("predicate"),
        F.when(F.col("obj_kind") == "iri", strip("object"))
        .otherwise(F.col("object")), "obj_kind").collect()}
    assert got == set(rows)


def test_ntriples_roundtrip_escapes_and_bad_langstring(spark, tmp_path):
    """ADVICE r1: quotes/backslashes must survive the roundtrip, and a
    langString lacking an '@lang' suffix must degrade to a plain string
    literal instead of the malformed (and silently dropped) `"..."@`."""
    from pyspark.sql import functions as F

    from qse_spark.sources.ntriples import write_ntriples
    rows = [
        ("d1", "quote", 'she said "hi"', "string"),
        ("d2", "path", "C:\\temp\\x", "string"),
        ("d3", "both", 'mix \\ and "q"', "string"),
        ("d4", "greet", "no-lang-suffix", "langString"),  # malformed input
        ("d5", "greet", 'qu"ote@fr', "langString"),
    ]
    df = spark.createDataFrame(rows, ["subject", "predicate", "object",
                                      "obj_kind"])
    out = str(tmp_path / "rt_esc")
    write_ntriples(df, out)
    back = read_ntriples(spark, out)
    strip = lambda c: F.regexp_replace(c, "^http://ex.org/", "")  # noqa: E731
    got = {tuple(r) for r in back.select(
        strip("subject"), strip("predicate"), "object", "obj_kind").collect()}
    # d4 degrades to a string literal (no data loss); everything else exact
    expect = {r for r in rows if r[0] != "d4"} | {
        ("d4", "greet", "no-lang-suffix", "string")}
    assert got == expect



def test_streaming_session_window_parity(spark, tmp_path):
    """Streaming session_window (append mode + watermark) emits exactly the
    batch sessions whose end precedes the final watermark — and on this
    fixture the late tail is small, so the check is non-vacuous."""
    import shutil

    from qse_spark.streaming.sessions import session_agg, sessionize_stream

    src = "/root/testdata/sf0.001/events.parquet"
    stream_dir = tmp_path / "events_in"
    stream_dir.mkdir()
    shutil.copy(src, stream_dir / "part-000.parquet")

    events = spark.read.parquet(src)
    batch = {tuple(r) for r in session_agg(events, "30 minutes").collect()}

    stream = sessionize_stream(spark, str(stream_dir), gap="30 minutes",
                               watermark="1 hour")
    q = (stream.writeStream.format("memory").queryName("stream_sessions")
         .outputMode("append").start())
    try:
        q.processAllAvailable()
        got = {tuple(r) for r in
               spark.sql("SELECT * FROM stream_sessions").collect()}
    finally:
        q.stop()
    assert got, "no sessions emitted before the final watermark"
    assert got <= batch
    # the watermark holds back only sessions ending within 1h+gap of the
    # fixture's max ts; everything else must have been emitted
    assert len(got) >= int(0.5 * len(batch))


def test_stateful_first_seen_across_microbatches(spark, tmp_path):
    """applyInPandasWithState streaming-distinct: a (entity, class) pair
    arriving in two micro-batches is emitted exactly once, and the final
    emitted set equals the batch distinct."""
    from pyspark.sql import functions as F

    from qse_spark.streaming.stateful import first_seen_pairs

    rows1 = [("alice", "Person"), ("bob", "Person"), ("alice", "Person")]
    rows2 = [("alice", "Person"), ("alice", "Employee"), ("carol", "Person")]
    in_dir = tmp_path / "pairs_in"
    in_dir.mkdir()
    # one file per micro-batch (maxFilesPerTrigger=1)
    spark.createDataFrame(rows1, ["entity", "class"]).coalesce(1) \
        .write.parquet(str(in_dir / "b1"))
    spark.createDataFrame(rows2, ["entity", "class"]).coalesce(1) \
        .write.parquet(str(in_dir / "b2"))

    stream = (spark.readStream.schema("entity string, class string")
              .option("maxFilesPerTrigger", 1)
              .parquet(str(in_dir) + "/*"))
    q = (first_seen_pairs(stream)
         .writeStream.format("memory").queryName("first_seen")
         .outputMode("append").start())
    try:
        q.processAllAvailable()
        got = [(r["entity"], r["class"]) for r in
               spark.sql("SELECT * FROM first_seen").collect()]
    finally:
        q.stop()
    # emitted exactly once per distinct pair — no duplicates at all
    assert sorted(got) == sorted(set(got))
    assert set(got) == {("alice", "Person"), ("alice", "Employee"),
                        ("bob", "Person"), ("carol", "Person")}


def test_streaming_checkpoint_restart_exactly_once(spark, fixture_dir,
                                                   tmp_path):
    """Stop a checkpointed streaming extraction mid-corpus, add more input,
    restart with the same checkpoint dir: the parquet sink ends up with
    exactly the batch-extraction rows — nothing duplicated, nothing lost
    (the streaming face of the pipeline's resume guarantee)."""
    from qse_spark.operators.extraction import extract_triples
    from qse_spark.streaming.extract import streaming_extract

    src = f"{fixture_dir}/transcripts.parquet"
    half = spark.read.parquet(src)
    convs = [r["conv_id"] for r in half.select("conv_id").distinct()
             .orderBy("conv_id").collect()]
    cut = set(convs[:len(convs) // 2])

    in_dir = tmp_path / "stream_in"
    in_dir.mkdir()
    out_dir = str(tmp_path / "out_parquet")
    ck_dir = str(tmp_path / "ckpt")
    from pyspark.sql import functions as F
    half.filter(F.col("conv_id").isin(cut)).coalesce(1) \
        .write.parquet(str(in_dir / "b1"))

    def run_once():
        q = (streaming_extract(spark, str(in_dir) + "/*")
             .writeStream.format("parquet")
             .option("path", out_dir).option("checkpointLocation", ck_dir)
             .outputMode("append").start())
        q.processAllAvailable()
        q.stop()

    run_once()                                    # first half, then "crash"
    half.filter(~F.col("conv_id").isin(cut)).coalesce(1) \
        .write.parquet(str(in_dir / "b2"))
    run_once()                                    # restart from checkpoint

    got = sorted(map(tuple, spark.read.parquet(out_dir).collect()))
    exp = sorted(map(tuple,
                     extract_triples(spark.read.parquet(src)).collect()))
    assert got == exp


def test_incremental_kg_matches_batch(spark, fixture_dir, tmp_path):
    """Multi-batch incremental ingestion (maxFilesPerTrigger=1 over three
    conversation-disjoint file chunks) must key-sum-merge to EXACTLY the
    single-batch fused aggregate (the stage-1 monoid), and the KG built
    on the merged aggregate must equal the batch pipeline's stats."""
    import os

    from pyspark.sql import functions as F

    from qse_spark.operators.extraction import extract_triple_groups
    from qse_spark.pipeline import run_pipeline
    from qse_spark.streaming.incremental import incremental_kg

    src = spark.read.parquet(f"{fixture_dir}/transcripts.parquet")
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    convs = sorted(r[0] for r in src.select("conv_id").distinct().collect())
    for i in range(3):
        chunk = set(convs[i::3])
        (src.filter(F.col("conv_id").isin(list(chunk))).coalesce(1)
         .write.parquet(str(in_dir / f"chunk{i}")))
    wd = str(tmp_path / "wd")
    out = incremental_kg(spark, str(in_dir) + "/*", wd, max_files=1)
    merged = sorted(map(tuple, out["triple_groups"].collect()))
    batch = sorted(map(tuple, extract_triple_groups(src).collect()))
    assert merged == batch
    deltas = [e for e in os.listdir(os.path.join(wd, "delta"))
              if e.startswith("batch=")]
    assert len(deltas) >= 2, "expected a genuinely multi-batch ingest"
    exp = run_pipeline(
        spark, f"{fixture_dir}/transcripts.parquet")["shape_stats"]
    assert sorted(map(tuple, out["shape_stats"].collect())) == \
        sorted(map(tuple, exp.collect()))


def test_incremental_ingest_resume_and_growth(spark, fixture_dir, tmp_path):
    """Re-running the drain with no new files must add nothing (the
    stream checkpoint is the exactly-once guard), and a file that
    arrives later must be picked up so the merged aggregate tracks the
    enlarged corpus."""
    import os

    from pyspark.sql import functions as F

    from qse_spark.operators.extraction import extract_triple_groups
    from qse_spark.streaming.incremental import (compact_groups,
                                                 ingest_transcripts)

    src = spark.read.parquet(f"{fixture_dir}/transcripts.parquet")
    convs = sorted(r[0] for r in src.select("conv_id").distinct().collect())
    early = set(convs[: len(convs) // 2])
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    (src.filter(F.col("conv_id").isin(list(early))).coalesce(1)
     .write.parquet(str(in_dir / "day1")))
    wd = str(tmp_path / "wd")

    ingest_transcripts(spark, str(in_dir) + "/*", wd, max_files=1)
    delta_dir = os.path.join(wd, "delta")

    def listing():
        return sorted(
            (d, sorted(os.listdir(os.path.join(delta_dir, d))))
            for d in os.listdir(delta_dir) if d.startswith("batch="))

    first = listing()
    first_merged = sorted(map(tuple, compact_groups(spark, wd).collect()))
    ingest_transcripts(spark, str(in_dir) + "/*", wd, max_files=1)
    assert listing() == first, "no-op drain must not write new deltas"
    assert sorted(map(tuple, compact_groups(spark, wd).collect())) == \
        first_merged

    (src.filter(~F.col("conv_id").isin(list(early))).coalesce(1)
     .write.parquet(str(in_dir / "day2")))
    ingest_transcripts(spark, str(in_dir) + "/*", wd, max_files=1)
    assert len(listing()) > len(first)
    merged = sorted(map(tuple, compact_groups(spark, wd).collect()))
    assert merged == sorted(map(tuple, extract_triple_groups(src).collect()))


def test_compact_groups_empty_workdir(spark, tmp_path):
    from qse_spark.streaming.incremental import compact_groups
    out = compact_groups(spark, str(tmp_path / "nowhere"))
    assert out.columns == ["subject", "predicate", "object", "obj_kind",
                           "cnt"]
    assert out.count() == 0


def test_incremental_compact_to_base(spark, fixture_dir, tmp_path):
    """compact_to_base folds the delta partitions into one batch=-1 base;
    later drains merge on top, and the final aggregate still equals the
    single-batch extraction over the full corpus."""
    import os

    from pyspark.sql import functions as F

    from qse_spark.operators.extraction import extract_triple_groups
    from qse_spark.streaming.incremental import (compact_groups,
                                                 compact_to_base,
                                                 ingest_transcripts)

    src = spark.read.parquet(f"{fixture_dir}/transcripts.parquet")
    convs = sorted(r[0] for r in src.select("conv_id").distinct().collect())
    early = set(convs[: len(convs) // 2])
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    (src.filter(F.col("conv_id").isin(list(early))).coalesce(1)
     .write.parquet(str(in_dir / "day1")))
    wd = str(tmp_path / "wd")
    assert compact_to_base(spark, wd) == 0          # nothing ingested yet

    ingest_transcripts(spark, str(in_dir) + "/*", wd, max_files=1)
    folded = compact_to_base(spark, wd)
    assert folded >= 1
    delta = os.path.join(wd, "delta")
    assert os.listdir(delta) == ["batch=-1"]
    day1 = sorted(map(tuple, compact_groups(spark, wd).collect()))
    assert day1 == sorted(map(tuple, extract_triple_groups(
        src.filter(F.col("conv_id").isin(list(early)))).collect()))

    (src.filter(~F.col("conv_id").isin(list(early))).coalesce(1)
     .write.parquet(str(in_dir / "day2")))
    ingest_transcripts(spark, str(in_dir) + "/*", wd, max_files=1)
    assert any(d != "batch=-1" for d in os.listdir(delta))
    merged = sorted(map(tuple, compact_groups(spark, wd).collect()))
    assert merged == sorted(map(tuple, extract_triple_groups(src).collect()))

def test_compact_publish_crash_recovery(spark, fixture_dir, tmp_path):
    """Every interruption window of compact_to_base's two-rename publish
    must recover to the FULL aggregate, never an empty store (round-4
    review finding: a crash between the renames used to leave no delta
    root, and later reads silently returned an empty KG while the stream
    checkpoint said all files were consumed)."""
    import os
    import shutil

    from qse_spark.streaming.incremental import (_OLD, _STAGE,
                                                 compact_groups,
                                                 compact_to_base,
                                                 ingest_transcripts)

    src = spark.read.parquet(f"{fixture_dir}/transcripts.parquet")
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    src.coalesce(1).write.parquet(str(in_dir / "day1"))
    wd = str(tmp_path / "wd")
    ingest_transcripts(spark, str(in_dir) + "/*", wd, max_files=1)
    want = sorted(map(tuple, compact_groups(spark, wd).collect()))
    assert want
    delta = os.path.join(wd, "delta")
    staged, old = os.path.join(wd, _STAGE), os.path.join(wd, _OLD)

    def snapshot(tag):
        dst = str(tmp_path / tag)
        shutil.copytree(wd, dst)
        return dst

    # window 1: crash DURING the staged write (delta intact, stale stage)
    w1 = snapshot("w1")
    os.makedirs(os.path.join(w1, _STAGE, "batch=-1"))
    assert sorted(map(tuple, compact_groups(spark, w1).collect())) == want
    assert not os.path.isdir(os.path.join(w1, _STAGE))

    # run a real compaction on a copy, re-creating each publish state
    w2 = snapshot("w2")
    assert compact_to_base(spark, w2) >= 1
    base = os.path.join(w2, "delta")

    # window 2: crash BETWEEN the renames (delta gone, staged complete)
    w3 = str(tmp_path / "w3")
    os.makedirs(w3)
    shutil.copytree(delta, os.path.join(w3, _OLD))
    shutil.copytree(base, os.path.join(w3, _STAGE))
    assert sorted(map(tuple, compact_groups(spark, w3).collect())) == want
    assert os.listdir(os.path.join(w3, "delta")) == ["batch=-1"]

    # window 2b: staged missing entirely -> roll back to the old store
    w4 = str(tmp_path / "w4")
    os.makedirs(w4)
    shutil.copytree(delta, os.path.join(w4, _OLD))
    assert sorted(map(tuple, compact_groups(spark, w4).collect())) == want

    # window 3: crash AFTER rename #2, before the old store is dropped
    w5 = str(tmp_path / "w5")
    os.makedirs(w5)
    shutil.copytree(base, os.path.join(w5, "delta"))
    shutil.copytree(delta, os.path.join(w5, _OLD))
    assert sorted(map(tuple, compact_groups(spark, w5).collect())) == want
    assert not os.path.isdir(os.path.join(w5, _OLD))

    # and compact_to_base itself recovers before compacting
    w6 = str(tmp_path / "w6")
    os.makedirs(w6)
    shutil.copytree(delta, os.path.join(w6, _OLD))
    assert compact_to_base(spark, w6) >= 1
    assert sorted(map(tuple, compact_groups(spark, w6).collect())) == want
