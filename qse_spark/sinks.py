"""S17 CSV/PSV sinks — the reference's tabular side outputs.

Twins of the reference writers (file:line provenance):
  write_class_frequency     Utility.writeClassFrequencyInFile
                            (`cs/qse/common/Utility.java:156-169`):
                            `classFrequency.csv` with header Class,Frequency
  write_shape_support_psv   Utility.writeSupportToFile
                            (`Utility.java:92-113`): the `|`-separated
                            shape-props-stats file
                            class|property|objType|support|classEntityCount
  write_shape_metrics_csv   ShapesExtractor's experiments log
                            (`ShapesExtractor.java:94-103,188-193`):
                            DATASET,Confidence,Support,<17 stat keys>,
                            comma-terminated rows, one appended per
                            (confidence, support) grid point ("> C%, > S"
                            cell format preserved; header key set matches
                            the genuine Output/wdt15/WikiData.csv artifact)
  prepare_stacked_csv       ExperimentsUtil.prepareCsvForGroupedStacked-
                            BarChart (`ExperimentsUtil.java:100-139`):
                            `<dataset>_stacked.csv`, byte-exact vs the
                            genuine Output/wdt15 artifact
  append_runtime_log        Utils.logTime (`cs/utils/Utils.java:66-74`):
                            Dataset,Method,Second,Minute,SecondTotal,
                            MinuteTotal,MaxCard,DatasetPath, appended
  append_sampling_log       Utils.logSamplingStats (`Utils.java:84-95`)

Scale note: every input here is a VOCABULARY-sized aggregate (class
counts, the stats table, a one-row metrics grid) — the reference likewise
holds them in driver-side hash maps before writing. A single local file
via toPandas is therefore the faithful and safe default; pass
`distributed=True` to the PSV writer to emit a partitioned Spark CSV
directory instead when the stats table is too large for one file.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _ensure_dir(path: str) -> None:
    d = os.path.dirname(os.path.abspath(path))
    if d:
        os.makedirs(d, exist_ok=True)


def write_class_frequency(class_counts: DataFrame, path: str) -> str:
    """`classFrequency.csv`: header `Class,Frequency`, one row per class,
    sorted by class for determinism (the reference iterates hash-map
    order). Input: class_counts_df output (class, class_count)."""
    _ensure_dir(path)
    pdf = (class_counts
           .select(F.col("class").alias("Class"),
                   F.col("class_count").alias("Frequency"))
           .orderBy("Class").toPandas())
    pdf.to_csv(path, index=False)
    return path


def write_shape_support_psv(stats: DataFrame, path: str,
                            distributed: bool = False) -> str:
    """The `|`-separated shape-props-stats file: one line per
    (class, property, objType) with its support and the class entity
    count. The reference writes `sampledEntitiesPerClass.get(...).size()`
    (Utility.java:104) — the SAMPLED size in approximate mode, the full
    entity count otherwise. approx_shape_stats keeps class_count as the
    FULL count (confidence adjustment needs both) and carries the sampled
    size in sampled_class_count, so a sampled stats table emits that
    column here (coalesced to class_count for classes with no sampled
    rows); exact tables have no sampled_class_count and emit class_count."""
    entity_cnt = (F.coalesce("sampled_class_count", "class_count")
                  if "sampled_class_count" in stats.columns
                  else F.col("class_count"))
    cols = [F.col("class"), F.col("property"), F.col("obj_type"),
            F.col("support").cast("long"),
            entity_cnt.cast("long")]
    if distributed:
        (stats.select(*cols)
         .write.mode("overwrite").option("sep", "|").csv(path))
        return path
    _ensure_dir(path)
    pdf = (stats.select(*[c.alias(n) for c, n in
                          zip(cols, ["class", "property", "obj_type",
                                     "support", "class_count"])])
           .orderBy("class", "property", "obj_type").toPandas())
    pdf.to_csv(path, sep="|", index=False, header=False)
    return path


def _grid_cell(v) -> str:
    """Render one experiments-grid stat like the reference's
    Literal.stringValue(): integral values without a decimal point,
    averages as plain decimals (COUNT/MIN/MAX are xsd:integer in the
    SPARQL results; only AVG is decimal)."""
    if isinstance(v, float) and v == int(v):
        return str(int(v))
    return str(v)


def write_shape_metrics_csv(metrics: DataFrame, path: str, dataset: str,
                            confidence: float | None = None,
                            support: int | None = None) -> str:
    """Append one `<dataset>.csv` experiments row from an
    experiments_grid_df one-row frame — the reference's 17-stat format
    (`ShapesExtractor.java:94-103`): header
    `DATASET,Confidence,Support,<17 stat keys>,` and every row
    comma-TERMINATED (the Java appends "," after each cell, so genuine
    artifacts like Output/wdt15/WikiData.csv end each line with a
    trailing comma — we reproduce that). Column order is canonical
    EXPERIMENTS_GRID_COLS; the reference's own order is HashMap
    iteration (nondeterministic across JVMs), so parity is on the key
    SET (tests/test_reference_output_parity.py).

    confidence/support None = the QSE-Default model (logged as
    `> 1.0%, > 1.0` like `ShapesExtractor.java:95`); the header line is
    written once, on first append."""
    from .shapes import EXPERIMENTS_GRID_COLS
    _ensure_dir(path)
    row = metrics.limit(1).toPandas().iloc[0]
    if confidence is None:
        cell_c, cell_s = " > 1.0%", " > 1.0"
    else:
        # round before rendering: raw float repr turns 0.07*100 into
        # '7.000000000000001%' (Java's Double.toString in the reference
        # has the same artifact, but a stable cell is worth the cosmetic
        # divergence — comparisons should not depend on fp repr noise)
        cell_c = f" > {round(confidence * 100, 6)}%"
        cell_s = f" > {support}"
    vals = ",".join(_grid_cell(row[c]) for c in EXPERIMENTS_GRID_COLS)
    line = f"{dataset},{cell_c},{cell_s},{vals},"
    header = ("DATASET,Confidence,Support,"
              + ",".join(EXPERIMENTS_GRID_COLS) + ",")
    write_header = not os.path.exists(path)
    with open(path, "a") as f:
        if write_header:
            f.write(header + "\n")
        f.write(line + "\n")
    return path


def prepare_stacked_csv(src_path: str, dst_path: str,
                        skip_first_row: bool = True) -> str:
    """`<dataset>_stacked.csv` from an experiments CSV — the reference's
    grouped-stacked-bar-chart transform (`ExperimentsUtil.java:100-139`,
    always invoked with skipFirstRow=true, e.g. `Parser.java:340`): for
    each metric row after the skipped QSE-Default row, emit
    `Confidence,Support,COUNT_CC,NonLiteral` and
    `Confidence,Support,COUNT_LC,Literal`, preserving the cells verbatim
    (leading spaces included). Header and rows APPEND like the
    reference's writeToFileInAppendMode — re-runs accumulate, which is
    why shipped artifacts hold several runs' blocks. Byte-exact parity
    with the genuine Output/wdt15 artifact is pytest-asserted. Driver-
    side on purpose: this consumes the experiments LOG (a few dozen
    lines), not data."""
    import csv as _csv
    with open(src_path) as f:
        reader = _csv.reader(f)
        header = next(reader)
        rows = list(reader)
    idx = {name: i for i, name in enumerate(header)}
    if skip_first_row and rows:
        rows = rows[1:]
    _ensure_dir(dst_path)
    with open(dst_path, "a") as f:
        f.write("Confidence,Support,COUNT,TYPE\n")
        for r in rows:
            pre = f"{r[idx['Confidence']]},{r[idx['Support']]}"
            f.write(f"{pre},{r[idx['COUNT_CC']]},NonLiteral\n")
            f.write(f"{pre},{r[idx['COUNT_LC']]},Literal\n")
    return dst_path


def append_runtime_log(path: str, dataset: str, method: str, seconds: int,
                       seconds_total: int, max_card: bool,
                       dataset_path: str) -> str:
    """One `<dataset>_RUNTIME_LOGS.csv` line:
    Dataset,Method,Second,Minute,SecondTotal,MinuteTotal,MaxCard,
    DatasetPath (minutes derived from seconds like TimeUnit.toMinutes)."""
    _ensure_dir(path)
    line = (f"{dataset},{method},{seconds},{seconds // 60},"
            f"{seconds_total},{seconds_total // 60},{max_card},"
            f"{dataset_path}")
    with open(path, "a") as f:
        f.write(line + "\n")
    return path


def append_sampling_log(path: str, sampling_type: str, percentage: int,
                        min_threshold: int, max_threshold: int,
                        container_size: int) -> str:
    """One `<dataset>_SAMPLING_LOGS.csv` line:
    samplingType,percentage,minThreshold,maxThreshold,containerSize."""
    _ensure_dir(path)
    with open(path, "a") as f:
        f.write(f"{sampling_type},{percentage},{min_threshold},"
                f"{max_threshold},{container_size}\n")
    return path


_PR_HEADER = ("File_A, File_B, Confidence, Support, NS, PS, NS_Samp, "
              "PS_Samp, Precision_NS, Recall_NS, Precision_PS, Recall_PS, "
              "MaxReservoirSize, TargetPercentage")


def write_precision_recall_csv(path: str, file_a: str, file_b: str,
                               ns_a: DataFrame, ps_a: DataFrame,
                               ns_b: DataFrame, ps_b: DataFrame,
                               confidence: float | None = None,
                               support: int | None = None,
                               max_reservoir: int | None = None,
                               target_pct: float | None = None) -> str:
    """One `<dataset>_PrecisionRecall.csv` line comparing shape set B
    (e.g. sampled) against baseline A (exact), exactly the reference's
    header/row shape (`PrecisionRecallComputer.java:49-63`): node shapes
    keyed by target class, property shapes by (target class, path)."""
    from .shapes import precision_recall
    pr_ns = precision_recall(ns_a.select("target_class"),
                             ns_b.select("target_class"))
    pr_ps = precision_recall(ps_a.select("target_class", "path"),
                             ps_b.select("target_class", "path"))

    def _cell(v):
        return "" if v is None else v

    line = ", ".join(str(x) for x in [
        file_a, file_b, _cell(confidence), _cell(support),
        pr_ns["a"], pr_ps["a"], pr_ns["b"], pr_ps["b"],
        round(pr_ns["precision"], 6), round(pr_ns["recall"], 6),
        round(pr_ps["precision"], 6), round(pr_ps["recall"], 6),
        _cell(max_reservoir), _cell(target_pct)])
    _ensure_dir(path)
    write_header = not os.path.exists(path)
    with open(path, "a") as f:
        if write_header:
            f.write(_PR_HEADER + "\n")
        f.write(line + "\n")
    return path


def write_reference_outputs(stats: DataFrame, class_counts: DataFrame,
                            out_dir: str, dataset: str,
                            grid: list[tuple[float, int]] | None = None,
                            type_predicate: str | None = None,
                            sh_not: bool = True,
                            sampled: bool = False) -> dict[str, str]:
    """Assemble the reference's whole Output/ directory in one call
    (`Main.java` drives ShapesExtractor.constructDefaultShapes +
    constructPrunedShapes per grid point, then the CSV side outputs):

      <dataset>_QSE_FULL_SHACL.ttl          default (unpruned) shapes
      <dataset>_QSE_<C>_<S>_SHACL.ttl       one per (confidence, support),
                                            sh:not wrappers included when
                                            sh_not=True
      classFrequency.csv                    Class,Frequency
      <dataset>.csv                         experiments metric rows
                                            (default + one per grid point)
      <dataset>-shape-props-stats.csv       class|property|objType|support|
                                            classEntityCount PSV

    Returns {label: path}. TTLs are written partitioned (each shard a
    self-contained document) — reference parity is per-shape-block, not
    per-file; the TTL reader accepts both. TTL/CSV/PSV files overwrite,
    but the experiments metrics CSV APPENDS one row per call like the
    reference's writeToFileInAppendMode — re-running into the same
    out_dir accumulates metric rows (delete `<dataset>.csv` first for a
    fresh log).

    sampled=True prunes each grid point with the QSE-Approximate
    relative-support rule (stats must carry the sampled_*_count columns
    approx_shape_stats emits) so a sampled run's TTLs/metrics keep the
    shapes the reference's sampled run keeps; sh:not wrappers follow
    the same switch — the reference's negativePruning uses the relative
    complement rule whenever sampling is on and S != 1
    (ShapesExtractor.java:400-404)."""
    from .constants import TYPE_PREDICATE
    from .shapes import (experiments_grid_df, negative_shapes,
                         node_shapes, property_shapes, pruned_shapes,
                         write_ttl)

    tp = type_predicate or TYPE_PREDICATE
    grid = grid if grid is not None else [(0.25, 100), (0.5, 100)]
    os.makedirs(out_dir, exist_ok=True)
    paths: dict[str, str] = {}
    # approx stats deliberately track support/confidence only — null-fill
    # the cardinality columns so sampled-mode outputs render (with no
    # min/maxCount constraints, the approximate pipeline's scope)
    for c in ("min_count", "max_count"):
        if c not in stats.columns:
            stats = stats.withColumn(c, F.lit(None).cast("int"))
    # this function fans ~4 + 3*len(grid) actions off the stats plan;
    # materialize it once (same GC-cleaned pattern as validation's
    # _checkpointed_stats, measured ~10x there)
    stats = stats.localCheckpoint(eager=True)

    full_ttl = os.path.join(out_dir, f"{dataset}_QSE_FULL_SHACL.ttl")
    full_ns, full_ps = node_shapes(stats), property_shapes(stats, tp)
    write_ttl(full_ns, full_ps, full_ttl)
    paths["QSE_FULL"] = full_ttl
    metrics_csv = os.path.join(out_dir, f"{dataset}.csv")
    # the metric row is computed over the SAME node/prop frames the
    # adjacent TTL renders — the grid always describes the emitted model
    write_shape_metrics_csv(experiments_grid_df(full_ns, full_ps),
                            metrics_csv, dataset)

    for conf, supp in grid:
        # ONE pruned_shapes spine (kept rows + the empty-constraints
        # type-PS reconstruction) feeds both the TTL and its metric
        # row, so the artifact, the metrics, and the P/R/parity paths
        # all describe the same emitted model
        ns, ps = pruned_shapes(stats, conf, supp, tp, sampled=sampled)
        neg = (negative_shapes(stats, conf, supp, tp, sampled=sampled)
               if sh_not else None)
        tag = f"QSE_{conf}_{supp}"
        p = os.path.join(out_dir, f"{dataset}_{tag}_SHACL.ttl")
        write_ttl(ns, ps, p, neg_props=neg)
        paths[tag] = p
        write_shape_metrics_csv(experiments_grid_df(ns, ps), metrics_csv,
                                dataset, conf, supp)
    paths["metrics"] = metrics_csv
    paths["stacked"] = prepare_stacked_csv(
        metrics_csv, os.path.join(out_dir, f"{dataset}_stacked.csv"))

    paths["classFrequency"] = write_class_frequency(
        class_counts, os.path.join(out_dir, "classFrequency.csv"))
    paths["shape_props"] = write_shape_support_psv(
        stats, os.path.join(out_dir, f"{dataset}-shape-props-stats.csv"))
    return paths
