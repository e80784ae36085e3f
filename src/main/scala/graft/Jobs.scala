package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.SteamOps

/** Job-level orchestration — the reference's application surface
  * (reference: run.py:16–63 wires SteamPricesETL then WorldMapETL; the
  * second job reads the first job's latest parquet drop).
  *
  * Spark-first shape: each job is a pure DataFrame transform plus one
  * sink write; the handoff between jobs is the date-stamped parquet key,
  * exactly as the reference hands off through its bucket.
  */
object Jobs {

  /** SteamPricesETL: build the (order, line, country, currency, usd) price
    * facts and land them under a date-stamped snappy-parquet key
    * (reference: run.py:46–55, steam_prices_transformer.py:193–210).
    * Returns the written path. */
  def runSteamPricesJob(s: SparkSession, sfDir: String, outDir: String,
      date: String): String = {
    val facts = SteamOps.pricesFact(s, sfDir, withBad = true)
      .select("l_orderkey", "l_linenumber", "cc", "n_name", "usd_price")
    SteamOps.writeDateStamped(facts, s"$outDir/steam_prices", date)
  }

  /** Incremental landing: merge a new drop's per-country partials into
    * the running partial state. Cost is O(new drop) + O(|countries|) —
    * never a rescan of history — and EXACT, because the state is
    * integer-scaled sums and counts (SteamOps.countryPartials), which
    * merge associatively. Final stats derive from the merged state via
    * SteamOps.devFromPartials whenever needed. */
  def mergeCountryPartials(state: Option[DataFrame], newDrop: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    val fresh = SteamOps.countryPartials(newDrop)
    state match {
      case None => fresh
      case Some(st) =>
        st.select("cc", "s6", "cnt").union(fresh)
          .groupBy("cc").agg(sum("s6").as("s6"), sum("cnt").as("cnt"))
    }
  }

  /** Disk round-trip of the incremental merge: read the prior state (if
    * any), merge the drop, land the new state under a date-stamped key —
    * prior versions stay readable while the new one is written. Returns
    * the new state path. */
  def landCountryPartials(s: SparkSession, stateBase: String, newDrop: DataFrame,
      date: String): String = {
    import org.apache.spark.sql.functions._
    // Prior state = latest version STRICTLY BEFORE the landing date. Two
    // properties follow: (a) re-landing the same date is an idempotent
    // retry (it merges from the same prior, not from its own partial
    // output — no double count), and (b) the overwrite target is never a
    // partition the merge plan is reading (no overwrite-while-read).
    val prior =
      try {
        val all = s.read.parquet(stateBase)
          .filter(col("dt") < lit(date).cast(org.apache.spark.sql.types.DateType))
        val latest = all.agg(max(col("dt")).as("latest_dt"))
        val st = all.join(broadcast(latest), col("dt") === col("latest_dt"))
          .select("cc", "s6", "cnt")
        if (st.isEmpty) None else Some(st)
      } catch {
        // only "no state yet" may fall through to a fresh start — any
        // other analysis failure (schema drift, corrupt state) must
        // surface, never silently reset the running totals
        case e: org.apache.spark.sql.AnalysisException
            if e.getMessage.contains("PATH_NOT_FOUND") ||
              e.getMessage.contains("Path does not exist") => None
      }
    val merged = mergeCountryPartials(prior, newDrop)
    SteamOps.writeDateStamped(merged, stateBase, date)
  }

  /** CurationETL: gate (quality ≥ 0.5 → language-consistency), then
    * QUALITY-AWARE near-dup survivor election — the
    * [[graft.operators.DedupOps.dedupSurvivors]] policy: per near-dup
    * cluster, the gate-PASSING member with the best quality-head logit
    * survives (ties → lowest doc_id). This is the copy real curation
    * ships — keep the best version of a duplicated page, not the
    * lowest-id one (the keyed `corpus_filter` query is untouched: it
    * stays the exact-hash / min-id reference policy). Election runs
    * among gate-passers, so a cluster whose globally-best member fails
    * a gate still lands its best PASSING member — gating then electing
    * never silently drops a cluster that has an acceptable copy. The
    * landed drop is the training-ready corpus: one row per kept doc
    * with its election provenance (cluster_id, cluster size, logit).
    * Returns the written path. */
  def runCurationJob(s: SparkSession, sfDir: String, outDir: String,
      date: String): String = {
    import org.apache.spark.sql.functions._
    import graft.operators.TextOps
    val passers = graft.Tables.documents(s, sfDir)
      .withColumn("quality", TextOps.qualityExpr(col("text")))
      .withColumn("pred_lang", TextOps.predLangExpr(col("text")))
      .filter(col("quality") >= lit(0.5) && col("pred_lang") === col("lang"))
      .select("doc_id", "text", "lang", "source", "n_chars")
    val verdicts = graft.operators.DedupOps.dedupSurvivors(s, sfDir)
      .select("doc_id", "cluster_id", "logit_e12", "n_members")
    // re-elect among passers only: one cluster_id-keyed window over the
    // gated join (cluster partitions are near-dup families, never
    // corpus-sized — the dedupSurvivors plan argument)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("cluster_id")
      .orderBy(col("logit_e12").desc, col("doc_id"))
    val kept = passers.join(verdicts, Seq("doc_id"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1).drop("rk")
    SteamOps.writeDateStamped(kept, s"$outDir/curated_corpus", date)
  }

  /** Compaction: rewrite one date partition of a landed drop into
    * ⌈bytes / targetFileBytes⌉ files. Streaming/incremental landings
    * accumulate small files (every micro-batch appends its own), and at
    * 100 TB the resulting per-file scheduling overhead dominates scans —
    * periodic compaction is standard table maintenance. Input size comes
    * from the file listing (no data read); the rewrite goes to a temp
    * sibling, then swaps in via a rename PAIR. Each rename is atomic but
    * the pair is not: a reader racing the swap can see a brief
    * path-missing window, and a crash between the renames parks the data
    * in `.dt=<date>.old` — the next run self-heals by restoring it. True
    * reader-isolated commits belong to a table format (Iceberg/Delta
    * snapshot commit); this is the plain-filesystem contract, stated
    * honestly. Returns the resulting file count.
    *
    * `layout`: when non-empty, the rewrite RE-CLUSTERS on the z-order of
    * these columns (range-partition + sort on the interleaved z-value,
    * [[graft.operators.LayoutOps.zorderWrite]]) instead of plain
    * `repartition(n)` — which round-robins rows and would flatten every
    * file's min-max bounding box to the full key range, silently
    * destroying the stats pruning a z-ordered landing was written for.
    * This is what Delta/Iceberg `OPTIMIZE ZORDER` is: compaction and
    * re-clustering as ONE rewrite. */
  def compactPartition(s: SparkSession, baseDir: String, date: String,
      targetFileBytes: Long = 128L * 1024 * 1024,
      layout: Seq[String] = Nil): Int =
    compactLeaf(s, s"$baseDir/dt=$date", targetFileBytes, layout)

  /** The generic leaf-directory form of [[compactPartition]] (same
    * crash-safe rename-pair protocol, parameterized over the directory)
    * — also the primitive the landed-INDEX maintenance jobs use to fold
    * admission's appended small files back into full-size ones
    * ([[graft.operators.AnnIndexOps.compactAnnIndex]] per `cell=` leaf,
    * [[graft.operators.RetrievalIndexOps.compactRetrievalIndex]] per
    * artifact). The sibling `.old`/`.tmp` names derive from the leaf's
    * own name, so concurrent compactions of DIFFERENT leaves never
    * collide. */
  def compactLeaf(s: SparkSession, leafDir: String,
      targetFileBytes: Long = 128L * 1024 * 1024,
      layout: Seq[String] = Nil): Int =
    compactLeafGuarded(s, leafDir, targetFileBytes, layout)

  /** [[compactLeaf]] with the race-injection seam exposed: `midWrite`
    * runs after the compacted rewrite is staged but BEFORE the swap —
    * exactly the window where a concurrent admission append used to be
    * silently discarded. The guard below makes that window safe, and the
    * spec drives this overload to prove it. */
  private[graft] def compactLeafGuarded(s: SparkSession, leafDir: String,
      targetFileBytes: Long = 128L * 1024 * 1024,
      layout: Seq[String] = Nil,
      midWrite: () => Unit = () => ()): Int = {
    import java.nio.file.{Files, Path, Paths, StandardCopyOption}
    def listParquet[A](dir: Path)(f: Seq[Path] => A): A = {
      val st = Files.list(dir)
      try f(st.toArray.map(_.asInstanceOf[Path]).toSeq
        .filter(_.getFileName.toString.endsWith(".parquet")))
      finally st.close() // Files.list holds a directory fd until closed
    }
    val part = Paths.get(leafDir)
    val leaf = part.getFileName.toString
    val old = part.resolveSibling(s".$leaf.old")
    // crash recovery: a previous run that died between the two renames
    // left the live data in `.old` and no partition — restore it; a
    // leftover `.old` NEXT TO a live partition is post-swap garbage
    if (Files.isDirectory(old)) {
      if (Files.isDirectory(part)) org.apache.commons.io.FileUtils.deleteDirectory(old.toFile)
      else Files.move(old, part, StandardCopyOption.ATOMIC_MOVE)
    }
    require(Files.isDirectory(part), s"no partition at $part")
    val bytes = listParquet(part)(_.map(Files.size).sum)
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val df = s.read.parquet(part.toString)
    // the EXACT file set Spark captured at scan time (the file index is
    // built eagerly at read.parquet) — any parquet file present in the
    // swapped-out directory later but absent here was appended by a
    // concurrent writer AFTER the scan and is NOT in the rewrite
    val readSet = df.inputFiles
      .map(p => p.substring(p.lastIndexOf('/') + 1)).toSet
    val tmp = part.resolveSibling(s".$leaf.compact.tmp")
    if (layout.nonEmpty)
      graft.operators.LayoutOps.zorderWrite(df, layout, tmp.toString, nFiles)
    else
      df.repartition(nFiles).write.mode("overwrite")
        .option("compression", "snappy").parquet(tmp.toString)
    midWrite()
    Files.move(part, old, StandardCopyOption.ATOMIC_MOVE)
    Files.move(tmp, part, StandardCopyOption.ATOMIC_MOVE)
    // single-writer guard: an admission append that landed between the
    // scan and the swap sits in `old` but not in the rewrite — move those
    // files into the live partition instead of deleting them with the
    // swapped-out originals (part-file names are UUID-unique, so the
    // moves can't collide). Turns the documented maintenance-window
    // hazard into a heal: compaction + concurrent append now loses
    // nothing, it just leaves the appended files unfolded until the
    // next compaction pass.
    listParquet(old)(_.filterNot(f => readSet(f.getFileName.toString)))
      .foreach(f => Files.move(f, part.resolve(f.getFileName),
        StandardCopyOption.ATOMIC_MOVE))
    org.apache.commons.io.FileUtils.deleteDirectory(old.toFile)
    listParquet(part)(_.size)
  }

  /** Maintenance pass — the nightly table service over ONE landed dt
    * partition, chaining the three operators a real lakehouse runs
    * together: z-order-aware COMPACTION ([[compactPartition]] with
    * `layout`, so the rewrite preserves the pruning geometry the landing
    * was z-ordered for) followed by a DQ GATE over the rewritten
    * partition. Returns one row per gate rule (`rule`, `violations`,
    * `checked`, `pass`) + the layout audit columns:
    *
    *  - `rows_preserved`   — the rewrite must not drop or duplicate rows
    *  - `layout_key_notnull` — clustering keys must stay non-null (a null
    *    key row sorts to one end and poisons that file's bounding box)
    *  - `pruning_preserved` — the fraction of files a mid-range probe on
    *    the leading layout column touches must not grow: compaction that
    *    widens the boxes (e.g. a plain repartition) fails THIS rule even
    *    though rows and schema survive — the regression only a
    *    stats-geometry audit can see.
    *
    * All three rules ride scalar aggregates (the bounds frame is one row
    * per FILE, the probe is a broadcast single-row range agg) — report
    * cost is independent of partition row count beyond the one rewrite
    * and two stats passes. */
  def runMaintenanceJob(s: SparkSession, baseDir: String, date: String,
      layoutCols: Seq[String],
      targetFileBytes: Long = 128L * 1024 * 1024): DataFrame = {
    import org.apache.spark.sql.functions._
    require(layoutCols.nonEmpty, "maintenance needs the layout columns")
    val part = s"$baseDir/dt=$date"
    val key = layoutCols.head
    // touched-file count for the probe box [mid, mid + range/16] on the
    // leading layout column — the pruning a stats-based reader gets
    def probe(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val g = df.agg(min(col(key)).as("lo"), max(col(key)).as("hi"))
      val r = graft.operators.LayoutOps.fileBounds(df, Seq(key))
        .join(broadcast(g))
        .agg(count(lit(1)).as("files"),
          sum((col(s"mn_$key") <= col("lo") + (col("hi") - col("lo")) / 2
              + (col("hi") - col("lo")) / 16 &&
            col(s"mx_$key") >= col("lo") + (col("hi") - col("lo")) / 2)
            .cast("long")).as("touched"))
        .head()
      (r.getAs[Long]("files"), r.getAs[Long]("touched"))
    }
    val before = s.read.parquet(part)
    val rowsBefore = before.count()
    val (filesBefore, touchedBefore) = probe(before)
    compactPartition(s, baseDir, date, targetFileBytes, layoutCols)
    val after = s.read.parquet(part)
    val rowsAfter = after.count()
    val (filesAfter, touchedAfter) = probe(after)
    val nullKeys = after.filter(layoutCols.map(col(_).isNull).reduce(_ || _)).count()
    // fraction tolerance: one file of slack — with fewer, larger files a
    // probe box inherently spans a larger share of each file's range
    val fracBefore = touchedBefore.toDouble / filesBefore
    val fracAfter = touchedAfter.toDouble / filesAfter
    val pruningOk = fracAfter <= fracBefore + 1.0 / filesAfter + 1e-9
    import s.implicits._
    Seq(
      ("rows_preserved", math.abs(rowsAfter - rowsBefore), rowsBefore,
        rowsAfter == rowsBefore, filesBefore, filesAfter, fracBefore, fracAfter),
      ("layout_key_notnull", nullKeys, rowsAfter, nullKeys == 0L,
        filesBefore, filesAfter, fracBefore, fracAfter),
      ("pruning_preserved", if (pruningOk) 0L else 1L, filesAfter, pruningOk,
        filesBefore, filesAfter, fracBefore, fracAfter))
      .toDF("rule", "violations", "checked", "pass",
        "files_before", "files_after", "touched_frac_before", "touched_frac_after")
  }

  /** CDC upsert — MERGE INTO semantics on a keyed parquet table: rows of
    * `changes` replace same-key rows of the stored table (left-anti join
    * keeps unmatched base rows), `_deleted`-flagged change rows tombstone
    * their key, everything else unions in. The rewrite lands next to the
    * live table and swaps in with the same two-rename + crash-recovery
    * protocol as [[compactPartition]], so readers never observe PARTIAL
    * data — but, exactly as there, a reader racing the swap can see a
    * transiently missing path between move(live→old) and move(tmp→live)
    * (the single-writer plain-filesystem contract; reader-isolated
    * commits need a snapshotting table format). A crash between renames
    * is repairable.
    *
    * Scale shape: the anti join shuffles base on the key ONCE (or
    * broadcasts `changes` when the change batch is small — the common CDC
    * case, left to Catalyst/AQE by keeping the join declarative). Cost is
    * O(base + changes) with no driver materialization. At warehouse scale
    * the same protocol applies per PARTITION (pair with dt-partitioned
    * landing) so a rewrite touches only partitions with changes. */
  def mergeUpsert(s: SparkSession, tableDir: String, changes: DataFrame,
      key: String): Long = {
    import org.apache.spark.sql.functions._
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val live = Paths.get(tableDir)
    val old = Paths.get(s"$tableDir.old")
    if (Files.isDirectory(old)) { // same crash-recovery contract as compact
      if (Files.isDirectory(live)) org.apache.commons.io.FileUtils.deleteDirectory(old.toFile)
      else Files.move(old, live, StandardCopyOption.ATOMIC_MOVE)
    }
    require(Files.isDirectory(live), s"no table at $tableDir")
    // MERGE contract: at most one change row per key (Delta/SQL MERGE
    // raise on multiple matches too — silently picking one would hide a
    // CDC compaction bug). The check is one agg over the small batch.
    val dup = changes.groupBy(col(key)).count().filter(col("count") > 1).limit(1)
    require(dup.isEmpty,
      s"mergeUpsert: changes batch has multiple rows for key " +
        s"${dup.head.get(0)} — compact the batch to last-wins first")
    // a NULL _deleted flag means "not deleted" (common CDC encoding that
    // only stamps deletes); filter(!col) would DROP null-flagged updates
    // from the upsert set while still anti-joining their keys away
    val hasTomb = changes.columns.contains("_deleted")
    val upserts = (if (hasTomb)
      changes.filter(!coalesce(col("_deleted"), lit(false))).drop("_deleted")
    else changes)
    val base = s.read.parquet(tableDir)
    val merged = base.join(changes.select(col(key)), Seq(key), "left_anti")
      .unionByName(upserts)
    val tmp = Paths.get(s"$tableDir.upsert.tmp")
    merged.write.mode("overwrite").option("compression", "snappy")
      .parquet(tmp.toString)
    Files.move(live, old, StandardCopyOption.ATOMIC_MOVE)
    Files.move(tmp, live, StandardCopyOption.ATOMIC_MOVE)
    org.apache.commons.io.FileUtils.deleteDirectory(old.toFile)
    s.read.parquet(tableDir).count()
  }

  /** World-map data export (reference: world_map_transformer.py:215–253
    * get_world_map renders a matplotlib Figure; external_resources.py:
    * 60–68 uploads the PNG). The figure RENDERING is driver-side
    * visualization — out of engine scope by decision (recorded round-2
    * verdict). The DATA handoff is in scope: this lands the
    * choropleth-ready frame — the alpha3 key the geo layer joins on plus
    * the plotted measures — as a date-stamped CSV drop that any plotting
    * layer (geopandas, vega) consumes directly. Returns the written path. */
  def exportWorldMapData(s: SparkSession, sfDir: String, outDir: String,
      date: String): String = {
    val world = SteamOps.steamPipeline(s, sfDir)
    val path = s"$outDir/world_map_data/dt=$date"
    graft.sources.Formats.writeCsv(world, path)
    path
  }

  /** GeoJSON render-path export — closes the reference-surface delta
    * short of PNG rasterization (reference: world_map_transformer.py:
    * 214–254 get_world_map merges the stats onto the geopandas world
    * frame and renders; external_resources.py:54–68 uploads the figure).
    * This lands the SAME merged frame as a GeoJSON FeatureCollection —
    * one Feature per country carrying the choropleth measures as
    * properties and a polygon geometry — so a plotting layer (geopandas
    * .read_file, vega, leaflet) renders with ZERO joins.
    *
    * Geometry source: a broadcast join against the deterministic
    * [[graft.sources.WorldBoundaries]] dim — the engine-side analog of
    * the geopandas/naturalearth boundary frame the reference loads
    * (world_map_transformer.py:161). Countries absent from the boundary
    * dim (none at this SF) fall back to [[placeholderGeometry]] so a
    * render never drops a feature. The join, JSON feature assembly and
    * bounded FeatureCollection fold are all real and tested.
    *
    * Scale shape: per-feature JSON assembly is a codegen'd projection;
    * the final fold is a collect_list over the WORLD DIM (bounded by the
    * planet's country count, ~250), never a fact table — the one place a
    * single-row agg is the right plan. Returns the written path. */
  def exportWorldMapGeoJson(s: SparkSession, sfDir: String, outDir: String,
      date: String): String = {
    import org.apache.spark.sql.functions._
    val world = withBoundaryGeometry(s,
      SteamOps.withEuPropagatedDif(SteamOps.worldTable(s, sfDir)))
    // ignoreNullFields=false: a no-data country must emit its measure
    // keys as explicit nulls, not drop them — render layers that map
    // fill over a uniform property schema break on absent keys
    val feature = to_json(struct(
      lit("Feature").as("type"),
      struct(col("alpha2"), col("alpha3"), col("continent"),
        col("avg_usd"), col("perc_dif"), col("usd_dif")).as("properties"),
      col("geometry")),
      Map("ignoreNullFields" -> "false"))
    val doc = world
      .select(col("alpha3"), feature.as("f"))
      // deterministic feature order: sort by the join key inside ONE
      // bounded aggregation (array_sort on ≤~250 structs)
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("alpha3"), col("f")))),
        x => x.getField("f")), ",").as("fs"))
      .select(concat(lit("""{"type":"FeatureCollection","features":["""),
        col("fs"), lit("]}")).as("value"))
    val path = s"$outDir/world_map_geojson/dt=$date"
    doc.coalesce(1).write.mode("overwrite").text(path)
    path
  }

  /** SVG choropleth render — the reference's ACTUAL final artifact
    * (world_map_transformer.py:214–254 renders the merged world frame
    * as a matplotlib/geopandas figure; external_resources.py:54–68
    * uploads it). This renders the same merged frame engine-side with
    * zero plotting dependencies: equirectangular projection of each
    * country's polygon rings into one `<path>` per feature, filled from
    * a 9-step sequential palette bucketed on perc_dif, with a
    * `<title>` tooltip carrying the measures.
    *
    * The path builder is RING-GENERIC (folds whatever
    * `geometry.coordinates` holds — each ring one `M…Z` subpath, so
    * island nations render every island); geometry comes from the
    * broadcast [[graft.sources.WorldBoundaries]] dim, the engine-side
    * naturalearth analog. Color min/max come from ONE bounded agg over
    * the world dim (≤~250 rows) broadcast back; per-feature path/color
    * assembly is a codegen'd projection; the document fold is a
    * collect_list over the dim — same bounded shape as the GeoJSON
    * export. Returns the written path. */
  def renderWorldMapSvg(s: SparkSession, sfDir: String, outDir: String,
      date: String): String = {
    import org.apache.spark.sql.functions._
    val (w, h) = (1000.0, 500.0)
    val world = withBoundaryGeometry(s,
      SteamOps.withEuPropagatedDif(SteamOps.worldTable(s, sfDir)))
    // projection: lon [-180,180] → x [0,W]; lat [90,-90] → y [0,H]
    def px(pt: org.apache.spark.sql.Column) =
      round((element_at(pt, 1) + lit(180.0)) / lit(360.0) * lit(w), 2)
    def py(pt: org.apache.spark.sql.Column) =
      round((lit(90.0) - element_at(pt, 2)) / lit(180.0) * lit(h), 2)
    // MultiPolygon: polygons → rings; one M…Z subpath per ring
    val d = array_join(transform(flatten(col("geometry.coordinates")), ring =>
      concat(lit("M"),
        array_join(transform(ring, pt =>
          concat(px(pt).cast("string"), lit(","), py(pt).cast("string"))), "L"),
        lit("Z"))), " ")
    // 9-step sequential palette (light→dark), bucketed on perc_dif over
    // the dim's own min/max — one broadcast single-row agg, never a fact
    val palette = array(Seq("#f7fbff", "#deebf7", "#c6dbef", "#9ecae1",
      "#6baed6", "#4292c6", "#2171b5", "#08519c", "#08306b").map(lit): _*)
    val stats = world.agg(min(col("perc_dif")).as("lo"), max(col("perc_dif")).as("hi"))
    val bucket = when(col("hi") > col("lo"),
      least(floor((col("perc_dif") - col("lo")) / (col("hi") - col("lo")) * 9)
        .cast("int"), lit(8))).otherwise(lit(4))
    // countries without data (the left join keeps every dim row — the
    // reference's map paints them too) get an explicit no-data gray;
    // a null must never null out the whole feature through concat
    val fill = when(col("perc_dif").isNull, lit("#cccccc"))
      .otherwise(element_at(palette, bucket + 1))
    val feature = concat(
      lit("""<path d=""""), d,
      lit("""" fill=""""), fill,
      lit("""" stroke="#555" stroke-width="0.3"><title>"""),
      col("alpha3"), lit(": avg_usd="),
      coalesce(col("avg_usd").cast("string"), lit("n/a")),
      lit(" perc_dif="),
      coalesce(col("perc_dif").cast("string"), lit("n/a")),
      lit("</title></path>"))
    val doc = world.join(broadcast(stats))
      .select(col("alpha3"), feature.as("f"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("alpha3"), col("f")))),
        x => x.getField("f")), "\n").as("fs"))
      .select(concat(
        lit(s"""<svg xmlns="http://www.w3.org/2000/svg" viewBox="0 0 ${w.toInt} ${h.toInt}">""" + "\n"),
        col("fs"), lit("\n</svg>")).as("value"))
    val path = s"$outDir/world_map_svg/dt=$date"
    doc.coalesce(1).write.mode("overwrite").text(path)
    path
  }

  /** PNG choropleth render — the reference's uploaded artifact is a
    * RASTERIZED figure (world_map_transformer.py:214–273 draws a
    * matplotlib PNG; external_resources.py:54–68 uploads the bytes).
    * [[renderWorldMapSvg]] covers the vector path; this renders the SAME
    * merged frame to real PNG bytes via [[graft.render.Raster]]
    * (even-odd scanline fill + a from-scratch PNG encoder over
    * java.util.zip — zero plotting dependencies). Same projection
    * formula, palette, bucketing, and no-data gray as the SVG, so the
    * two artifacts cannot disagree. The pixel pass runs over the
    * COLLECTED world dim — bounded by the planet (≤ ~250 features), the
    * same bound the SVG's collect_list fold already materializes into
    * one row; no fact table is ever touched. Deterministic end to end
    * (deflate of a deterministic raster), so re-runs land byte-equal
    * files. Returns the written file path. */
  def renderWorldMapPng(s: SparkSession, sfDir: String, outDir: String,
      date: String): String = {
    import org.apache.spark.sql.functions._
    val (w, h) = (1000, 500)
    val world = withBoundaryGeometry(s,
      SteamOps.withEuPropagatedDif(SteamOps.worldTable(s, sfDir)))
    def px(pt: org.apache.spark.sql.Column) =
      (element_at(pt, 1) + lit(180.0)) / lit(360.0) * lit(w.toDouble)
    def py(pt: org.apache.spark.sql.Column) =
      (lit(90.0) - element_at(pt, 2)) / lit(180.0) * lit(h.toDouble)
    val palette = array(Seq("#f7fbff", "#deebf7", "#c6dbef", "#9ecae1",
      "#6baed6", "#4292c6", "#2171b5", "#08519c", "#08306b").map(lit): _*)
    val stats = world.agg(min(col("perc_dif")).as("lo"), max(col("perc_dif")).as("hi"))
    val bucket = when(col("hi") > col("lo"),
      least(floor((col("perc_dif") - col("lo")) / (col("hi") - col("lo")) * 9)
        .cast("int"), lit(8))).otherwise(lit(4))
    val fill = when(col("perc_dif").isNull, lit("#cccccc"))
      .otherwise(element_at(palette, bucket + 1))
    val feats = world.join(broadcast(stats))
      .select(col("alpha3"),
        transform(flatten(col("geometry.coordinates")),
          ring => transform(ring, pt => array(px(pt), py(pt)))).as("rings"),
        fill.as("fill"))
      .orderBy("alpha3")
      .collect() // planet-bounded dim: the artifact step, never a fact scan
    // Spark hands nested arrays back as mutable ArraySeq — type the cast
    // with collection.Seq or the inner maps ClassCastException
    val features = feats.toSeq.map { r =>
      val rings = r.getAs[collection.Seq[collection.Seq[collection.Seq[Double]]]]("rings")
      (rings.toSeq.map(_.toSeq.map(p => (p(0), p(1)))),
        graft.render.Raster.hex(r.getAs[String]("fill")))
    }
    val img = graft.render.Raster.fillPolygons(w, h, 0xffffff, features,
      stroke = 0x555555)
    val dir = java.nio.file.Paths.get(s"$outDir/world_map_png/dt=$date")
    java.nio.file.Files.createDirectories(dir)
    val file = dir.resolve("world_map.png")
    java.nio.file.Files.write(file, graft.render.Raster.encodePng(w, h, img))
    file.toString
  }

  /** world_map_features — the choropleth render frame summarized as a
    * queryable geometry panel: per country, how many polygons (islands)
    * and vertices its boundary carries, its lon/lat bbox, and whether
    * stats joined (the reference's merged naturalearth frame,
    * world_map_transformer.py:205–208, as data instead of pixels).
    * Fully oracle-checked since round 10: the in-code
    * [[graft.sources.WorldBoundaries]] dim is deterministic, so the
    * DuckDB twin inlines its parsed rings' fold results as a VALUES
    * literal and every count/bbox hash-compares. All geometry math is
    * array-fold projection over the broadcast-joined dim — bounded by
    * the planet, zero fact shuffles. */
  def worldMapFeatures(s: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val world = withBoundaryGeometry(s,
      SteamOps.withEuPropagatedDif(SteamOps.worldTable(s, sfDir)))
    val pts = flatten(flatten(col("geometry.coordinates")))
    def lons = transform(pts, p => element_at(p, 1))
    def lats = transform(pts, p => element_at(p, 2))
    world.select(col("alpha3"), col("continent"),
      size(col("geometry.coordinates")).cast("long").as("n_polygons"),
      size(pts).cast("long").as("n_vertices"),
      array_min(lons).as("lon_min"), array_max(lons).as("lon_max"),
      array_min(lats).as("lat_min"), array_max(lats).as("lat_max"),
      col("perc_dif").isNotNull.as("has_data"))
      .orderBy("alpha3")
  }

  /** Attach boundary geometry to a world-table frame: broadcast join
    * against the deterministic [[graft.sources.WorldBoundaries]] dim on
    * alpha3 (the reference's naturalearth merge, world_map_transformer
    * .py:205–208), falling back to [[placeholderGeometry]] for codes the
    * boundary dim doesn't know so a render never drops a country. The
    * boundary side is bounded by the planet — always the broadcast side;
    * the stats side stays distributed. */
  private[graft] def withBoundaryGeometry(s: SparkSession,
      world: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    val b = graft.sources.WorldBoundaries.dim(s).select("alpha3", "geometry")
    world.join(broadcast(b), Seq("alpha3"), "left")
      .withColumn("geometry",
        coalesce(col("geometry"), placeholderGeometry(col("alpha3"))))
  }

  /** Deterministic placeholder polygon for a country code the boundary
    * dim doesn't cover: a 4°×4° square centered at hash-derived
    * coordinates (lon ∈ [-178,178], lat ∈ [-58,58]), closed ring,
    * GeoJSON MultiPolygon nesting to match [[graft.sources
    * .WorldBoundaries]] rows. Deterministic in the code, so re-runs land
    * byte-equal artifacts. */
  private[graft] def placeholderGeometry(alpha3: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val lon = (pmod(xxhash64(alpha3), lit(356L)) - lit(178L)).cast("double")
    val lat = (pmod(xxhash64(alpha3, lit(1L)), lit(116L)) - lit(58L)).cast("double")
    def pt(dx: Int, dy: Int) = array(lon + lit(dx * 2.0), lat + lit(dy * 2.0))
    struct(
      lit("MultiPolygon").as("type"),
      array(array(array(pt(-1, -1), pt(1, -1), pt(1, 1), pt(-1, 1), pt(-1, -1))))
        .as("coordinates"))
  }

  /** Config-driven pipeline wiring (reference: run.py:16–44 reads
    * configs/etl_config.yml and hands each ETL its source/target
    * sections). Runs the prices job then the world-map job off ONE config
    * file, mirroring the reference's two-job run; returns the landed
    * prices path and the world row count keyed like the config sections. */
  def runFromConfig(s: SparkSession, cfgPath: String): Map[String, String] = {
    val cfg = GraftConfig.load(cfgPath)
    val sfDir = cfg("steam_prices_etl.source.sf_dir")
    val outDir = cfg("steam_prices_etl.target.base_dir")
    val date = cfg("steam_prices_etl.target.run_date")
    val landed = runSteamPricesJob(s, sfDir, outDir, date)
    val world = runWorldMapJob(s, sfDir, outDir)
    Map(
      "steam_prices_etl.landed" -> landed,
      "world_map_etl.rows" -> world.count().toString)
  }

  /** Retry policy for the ingest jobs. The reference's extract loop
    * sleeps a fixed wait between calls and skips failures outright
    * (steam_prices_transformer.py:134–166, `time.sleep(wait_time)` +
    * per-(app, cc) try/except-continue); at engine scale the policy is
    * DATA, not sleeps: every transient failure lands in a RETRY QUEUE
    * row carrying its next attempt number and exponential backoff
    * seconds (the fetcher's re-fetch schedule), and a row that exhausts
    * `maxAttempts` lands in the permanent rejects with its attempt count
    * — so the quarantine records exactly how hard the pipeline tried. */
  case class RetryPolicy(maxAttempts: Int = 3, baseBackoffSecs: Long = 3,
      factor: Long = 3) {
    require(maxAttempts >= 1, "maxAttempts must be >= 1")
    /** Backoff before attempt `n` (1-based): base · factor^(n-1). */
    def backoffSecs(attempt: Int): Long =
      baseBackoffSecs * math.round(math.pow(factor.toDouble, (attempt - 1).toDouble))
  }

  /** IngestETL — the reference's HTTP extract layer re-expressed as a
    * landing job (reference: external_resources.py:100–137 SteamWebApi
    * .get_app_price digs price_overview.final_formatted/currency out of
    * each API response and asserts their presence). The driver-side
    * fetcher drops raw responses as JSONL, one response per line (the
    * splittable layout), optionally tagging each line with the HTTP
    * `status` and the 0-based `attempt` that produced it; this job
    * parses them DISTRIBUTED-side with an explicit schema — one
    * `from_json`-equivalent pass, no inference scan — and lands the
    * usable price facts under the date-stamped key the downstream jobs
    * already read. Where the reference `assert`s, a 100 TB feed
    * quarantines — and TRIAGES: transient failures (429/5xx/truncated
    * line) go to the retry queue with `attempt`+`backoff_secs` per
    * [[RetryPolicy]] until exhausted; everything else (2xx without
    * price fields, 4xx) is a fact about the app, not the transport, and
    * rejects immediately with a reason. The fetcher replays the retry
    * queue after the recorded backoff, carrying `attempt` forward, so
    * recovery needs no job-side state beyond the drops themselves.
    * Returns (landedPath, retryQueuePath, rejectsPath). */
  def runPriceIngestJob(s: SparkSession, rawJsonl: String, outDir: String,
      date: String, retry: RetryPolicy = RetryPolicy()): (String, String, String) = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val schema = StructType.fromDDL(
      "app_id BIGINT, cc STRING, status INT, attempt INT, " +
        "data STRUCT<price_overview: STRUCT<final_formatted: STRING, currency: STRING>>")
    val raw = graft.sources.Formats.readJsonlPermissive(s, rawJsonl, schema)
      .select(col("app_id"), col("cc"),
        col("data.price_overview.final_formatted").as("price_str"),
        col("data.price_overview.currency").as("currency"),
        col("status"), coalesce(col("attempt"), lit(0)).as("attempt"),
        col("_corrupt_record"))
    val httpOk = col("status").isNull || (col("status") >= 200 && col("status") < 300)
    val usable = col("_corrupt_record").isNull && httpOk &&
      col("price_str").isNotNull && col("currency").isNotNull
    val transient = col("_corrupt_record").isNotNull ||
      (col("status").isNotNull && (col("status") === 429 || col("status") >= 500))
    val attemptsMade = col("attempt") + lit(1)
    val landed = SteamOps.writeDateStamped(
      raw.filter(usable).select("app_id", "cc", "price_str", "currency"),
      s"$outDir/api_prices", date)
    val retryQueue = SteamOps.writeDateStamped(
      raw.filter(!usable && transient && attemptsMade < retry.maxAttempts)
        .select(col("app_id"), col("cc"), col("status"),
          attemptsMade.as("attempt"),
          (lit(retry.baseBackoffSecs) * round(pow(lit(retry.factor.toDouble),
            (attemptsMade - 1).cast("double")))).cast("bigint").as("backoff_secs"),
          col("_corrupt_record")),
      s"$outDir/api_retry", date)
    val rejects = SteamOps.writeDateStamped(
      raw.filter(!usable && (!transient || attemptsMade >= retry.maxAttempts))
        .withColumn("attempts_made", attemptsMade)
        .withColumn("reason",
          when(transient, lit("retries_exhausted"))
            .when(!httpOk, lit("http_error"))
            .otherwise(lit("no_price"))),
      s"$outDir/api_rejects", date)
    (landed, retryQueue, rejects)
  }

  /** Exchange-rates ingest (reference: external_resources.py:139–175
    * OpenExRatesApi.get_ex_rates returns one `rates` object): each JSONL
    * line is one API response; the rates map explodes to (currency, rate)
    * rows — the shape SteamOps.currencyConvert joins against. Same
    * [[RetryPolicy]] triage as the price ingest (one response per line;
    * a 429/5xx/corrupt line re-queues with backoff until exhausted).
    * Returns (landedPath, retryQueuePath). */
  def runRatesIngestJob(s: SparkSession, rawJsonl: String, outDir: String,
      date: String, retry: RetryPolicy = RetryPolicy()): (String, String) = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val schema = StructType.fromDDL(
      "base STRING, status INT, attempt INT, rates MAP<STRING, DOUBLE>")
    val raw = graft.sources.Formats.readJsonlPermissive(s, rawJsonl, schema)
    val httpOk = col("status").isNull || (col("status") >= 200 && col("status") < 300)
    val usable = col("_corrupt_record").isNull && httpOk && col("rates").isNotNull
    val attemptsMade = coalesce(col("attempt"), lit(0)) + lit(1)
    val landed = SteamOps.writeDateStamped(
      raw.filter(usable)
        .select(col("base"), explode(col("rates")).as(Seq("currency", "rate"))),
      s"$outDir/ex_rates", date)
    val retryQueue = SteamOps.writeDateStamped(
      raw.filter(!usable && attemptsMade < retry.maxAttempts)
        .select(col("base"), col("status"), attemptsMade.as("attempt"),
          (lit(retry.baseBackoffSecs) * round(pow(lit(retry.factor.toDouble),
            (attemptsMade - 1).cast("double")))).cast("bigint").as("backoff_secs"),
          col("_corrupt_record")),
      s"$outDir/rates_retry", date)
    (landed, retryQueue)
  }

  /** WorldMapETL: pick the latest date partition of the prices drop,
    * aggregate to the enriched world table (country averages, world
    * deviation, iso/geo joins, EU propagation)
    * (reference: run.py:57–63, world_map_transformer.py:275–300).
    *
    * The latest-drop selection is partition-pruned: `dt` is a partition
    * column, so only the newest directory is scanned. */
  /** Land the pre-join hot-key skew panel for ANY (table, key) pair as a
    * dt-stamped drop — run this per ingest for every key a downstream
    * join shuffles on, so [[keySkewDrift]] can page on drift BEFORE a
    * stage wedges (the posture `QualityOps.keySkewOf`'s scaladoc
    * promises). Drops land under `baseDir/key_skew/<key>/dt=<date>`;
    * the panel is k rows whatever the fact size, so a year of daily
    * drops for 20 keys is ~73k rows — a broadcastable dimension. */
  def runKeySkewJob(s: SparkSession, table: DataFrame, keyCol: String,
      baseDir: String, date: String, k: Int = 10): String =
    SteamOps.writeDateStamped(
      graft.operators.QualityOps.keySkewOf(table, keyCol, k),
      s"$baseDir/key_skew/$keyCol", date)

  /** Day-over-day hot-key drift between two landed skew drops: per key,
    * both days' skew multiples, the delta, and a status — `entered`
    * (new in the top-k: the classic incident precursor), `left`, or
    * `stayed`. Sorted by |delta| so the pager line is row 1. Reads two
    * k-row panels — driver-light by construction. */
  def keySkewDrift(s: SparkSession, baseDir: String, keyCol: String,
      dateA: String, dateB: String): DataFrame = {
    import org.apache.spark.sql.functions._
    def day(d: String, suffix: String) =
      s.read.parquet(s"$baseDir/key_skew/$keyCol/dt=$d")
        .select(col("key"), col("n").as(s"n_$suffix"),
          col("skew_x").as(s"skew_$suffix"))
    day(dateA, "a").join(day(dateB, "b"), Seq("key"), "full_outer")
      .select(col("key"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"),
        coalesce(col("skew_a"), lit(0.0)).as("skew_a"),
        coalesce(col("skew_b"), lit(0.0)).as("skew_b"),
        (coalesce(col("skew_b"), lit(0.0)) -
          coalesce(col("skew_a"), lit(0.0))).as("skew_delta"),
        when(col("skew_a").isNull, lit("entered"))
          .when(col("skew_b").isNull, lit("left"))
          .otherwise(lit("stayed")).as("status"))
      .orderBy(abs(col("skew_delta")).desc, col("key"))
  }

  def runWorldMapJob(s: SparkSession, sfDir: String, pricesBase: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val drops = s.read.parquet(s"$pricesBase/steam_prices")
    val latest = drops.agg(max(col("dt")).as("latest_dt"))
    val lastDrop = drops.join(broadcast(latest), col("dt") === col("latest_dt"))
    // identical math to the oracle-checked operator path: worldDev →
    // iso/geo enrichment → EU propagation, just over the landed drop
    SteamOps.withEuPropagatedDif(
        SteamOps.worldTableFrom(SteamOps.worldDev(lastDrop), s, sfDir))
      .select("alpha2", "alpha3", "continent", "avg_usd", "perc_dif", "usd_dif")
      .orderBy("alpha2")
  }
}
